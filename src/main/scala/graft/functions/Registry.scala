package graft.functions

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Named-function registry behind the `Fn`/`PredFn` DSL nodes — the engine's
  * equivalent of the reference's arbitrary-callable escape hatches (`Cast`,
  * `Custom`, `Map`, `Filter` all accept raw Python functions,
  * /root/reference/wrangle_pypes/transformations.py:64-77,119-132).
  *
  * Keeping functions *named* (instead of embedding raw lambdas in specs)
  * keeps pipeline specs serializable/inspectable, and strongly biases users
  * toward `Column => Column` functions built from
  * `org.apache.spark.sql.functions._` — which stay inside whole-stage
  * codegen. A true Scala-lambda `udf` can still be registered explicitly
  * (the documented last resort). */
object Registry {

  /** A column function plus its output-type rule (the compiler threads
    * static types through the AST, so every function must declare how it
    * maps input type → output type). */
  final case class ColFn(fn: Column => Column, out: DataType => DataType)

  private val fns = TrieMap[String, ColFn]()
  private val preds = TrieMap[String, (Column, DataType) => Column]()

  def register(name: String, out: DataType => DataType)(fn: Column => Column): Unit =
    fns.put(name, ColFn(fn, out))

  /** Fixed-output-type convenience. */
  def register(name: String, out: DataType)(fn: Column => Column): Unit =
    register(name, (_: DataType) => out)(fn)

  /** Type-preserving convenience. */
  def registerSameType(name: String)(fn: Column => Column): Unit =
    register(name, (dt: DataType) => dt)(fn)

  def registerPred(name: String)(p: (Column, DataType) => Column): Unit =
    preds.put(name, p)

  /** Explicit udf escape hatch — full `Custom` parity for logic that
    * genuinely cannot be expressed with built-in functions. */
  def registerUdf(name: String, u: org.apache.spark.sql.expressions.UserDefinedFunction,
                  out: DataType): Unit =
    register(name, out)(c => u(c))

  def fn(name: String): ColFn =
    fns.getOrElse(name,
      throw new graft.compile.PlanException(s"unregistered function: $name"))

  def pred(name: String): (Column, DataType) => Column =
    preds.getOrElse(name,
      throw new graft.compile.PlanException(s"unregistered predicate: $name"))

  // ------------------------------------------------------------------
  // Built-ins: the standard scalar library the reference delegates to
  // host-language callables (int, float, str, upper, …). All codegen'd.
  // ------------------------------------------------------------------
  registerSameType("upper")(upper)
  registerSameType("lower")(lower)
  registerSameType("trim")(trim)
  registerSameType("abs")(abs)
  register("length", IntegerType)(length)
  register("str", StringType)(_.cast(StringType))
  register("int", LongType)(_.cast(LongType))
  register("float", DoubleType)(_.cast(DoubleType))
  register("to_date", DateType)(to_date(_))
  register("to_timestamp", TimestampType)(to_timestamp(_))
  registerSameType("negate")(c => -c)

  registerPred("nonempty") { (c, dt) =>
    dt match {
      case StringType                  => c.isNotNull && length(c) > 0
      case _: ArrayType | _: MapType   => c.isNotNull && size(c) > 0
      case _                           => c.isNotNull
    }
  }
}
