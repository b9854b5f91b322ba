package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType

/** The operator AST of the engine — one node per transformation in the
  * reference's inventory (SURVEY.md §2.3; reference export list at
  * /root/reference/wrangle_pypes/transformations.py:22-44).
  *
  * Nodes are *plan-time* values: the compiler (graft.compile.Compiler) lowers a
  * `Transform` tree to a single Catalyst `Column` expression tree, so Spark
  * sees one declarative projection per model and Catalyst/Tungsten do all
  * optimization and execution. Nothing here runs per-row on the driver.
  *
  * Composition: `a | b | c` builds a [[Chain]] (reference `__or__`,
  * pipeline.py:150-151,154-166). Unlike the reference (which mutates the
  * chain in place), `|` here is pure — safer for reuse of sub-trees.
  */
sealed trait Transform extends Serializable {
  def |(next: Transform): Transform = (this, next) match {
    case (Chain(a), Chain(b)) => Chain(a ++ b)
    case (Chain(a), b)        => Chain(a :+ b)
    case (a, Chain(b))        => Chain(a +: b)
    case (a, b)               => Chain(Seq(a, b))
  }
}

/** Identity — reference transformations.py:50-53. */
case object Id extends Transform

/** Emit a constant, ignoring input — transformations.py:56-61.
  * Scalar constants only; use [[ConstantCol]] for nested literals. */
final case class Constant(value: Any) extends Transform

/** Engine extension of [[Constant]] for arbitrary `Column` literals
  * (e.g. `typedLit(Seq(1,2))`) whose type must be given explicitly. */
final case class ConstantCol(@transient col: Column, dataType: DataType) extends Transform

/** Cast to a standard Spark type — the declarative core of the reference's
  * `Cast(func)` idiom (`int`, `float`, `datetime.fromisoformat`, …;
  * transformations.py:64-69). Arbitrary-callable casts go through
  * [[Fn]] + the function registry. */
final case class CastTo(dataType: DataType) extends Transform

/** Apply a named registered column function — covers both reference `Cast`
  * with an arbitrary callable (transformations.py:64-69) and `Custom`
  * (transformations.py:72-77). Functions live in graft.functions.Registry;
  * they are `Column => Column` (codegen-friendly built-ins preferred, udf as
  * the explicit escape hatch). */
final case class Fn(name: String) extends Transform

/** Fallback by predicate — transformations.py:80-86. The reference default
  * predicate is Python truthiness (None/""/0/[]/{} are all falsy), replicated
  * exactly by [[Truthy]]; pass [[IsNotNull]] for a plain NULL-coalesce. */
final case class Default(value: Any, cond: Pred = Truthy) extends Transform

/** Subscript a mapping/sequence with optional fallback —
  * transformations.py:89-108. Compile-time dispatch on the input type:
  * struct field / map key / array index (Python 0-based, negatives from the
  * end) / JSON-string path. The reference's `None`-as-no-default sentinel
  * (transformations.py:102-108) becomes `Option`: `default = None` means
  * "no fallback" and a missing struct field is a plan-time error. */
final case class Get(key: Any, default: Option[Any] = None) extends Transform

/** Object attribute access — transformations.py:111-116. In a DataFrame
  * world attributes and dict keys collapse to struct fields. */
final case class Attr(name: String) extends Transform

/** Keep elements of an array matching `pred`. Implements the reference's
  * *intended* semantics; as written the reference tests the whole iterable
  * per element (bug, transformations.py:119-124 — documented deviation,
  * SURVEY.md §2.3 #8). */
final case class FilterT(pred: Pred) extends Transform

/** Map a transformation over array elements — covers both reference `Map`
  * (plain callable, transformations.py:127-132) and `ForEach`
  * (transformation AST, transformations.py:135-143): in this engine a
  * "callable" IS a transform tree, so the two collapse into one node.
  * [[ForEach]] is kept as an alias for surface parity. */
final case class MapT(t: Transform) extends Transform
object ForEach { def apply(t: Transform): Transform = MapT(t) }

/** Concatenate one nesting level, `depth` times — transformations.py:146-156. */
final case class Flatten(depth: Int = 1) extends Transform

/** Project a subset of keys — transformations.py:159-166. Struct → sub-struct,
  * map → filtered map. A missing struct key is a plan-time error (the
  * reference raises KeyError at runtime). */
final case class Gather(keys: Seq[String]) extends Transform

/** Pivot a mapping-of-mappings into a list of mappings, folding each outer
  * key in under field `name` — transformations.py:169-176. Relationally this
  * is melt/unpivot. */
final case class FoldInKeys(name: String) extends Transform

/** Remove entry `key` and broadcast its value into every remaining
  * mapping-valued entry under field `name` — transformations.py:179-191. */
final case class FoldInValue(key: String, name: String) extends Transform

/** Mapping keys as a list — transformations.py:194-199. */
case object GetKeys extends Transform

/** Mapping values as a list — transformations.py:202-207. */
case object GetValues extends Transform

/** Conditional dispatch — transformations.py:210-222. No `else_` ⇒ NULL,
  * matching the reference's `None` branch exactly. */
final case class If(cond: Pred, thenT: Transform, elseT: Option[Transform] = None)
    extends Transform

/** Recurse into the pipeline for a nested model — transformations.py:225-230.
  * Compiles to a nested `struct(...)` built from the child model's spec;
  * cyclic model references are rejected at plan time (the reference would
  * recurse forever). */
final case class Create(model: String) extends Transform

/** Map [[Create]] over a sequence — transformations.py:233-240. */
final case class CreateMultiple(model: String) extends Transform

/** Chain of transforms; output of one feeds the next —
  * pipeline.py:154-166. */
final case class Chain(ts: Seq[Transform]) extends Transform

// ---------------------------------------------------------------------------
// Predicate DSL
// ---------------------------------------------------------------------------

/** Predicates used by [[Default]], [[If]] and [[FilterT]]. The reference
  * accepts arbitrary Python callables; this engine keeps predicates
  * declarative so they stay inside Catalyst codegen. [[PredFn]] is the
  * registry escape hatch. */
sealed trait Pred extends Serializable {
  def unary_! : Pred = Not(this)
  def &&(o: Pred): Pred = And(this, o)
  def ||(o: Pred): Pred = Or(this, o)
}

/** Python truthiness (SURVEY.md §7.3): false for NULL, false, 0, "", empty
  * array/map; true otherwise. Compiled per input type. */
case object Truthy extends Pred
case object IsNull extends Pred
case object IsNotNull extends Pred
/** Compare the value against a literal: ops `<, <=, >, >=, ==, !=`. */
final case class Cmp(op: String, value: Any) extends Pred
/** Membership in a literal set. */
final case class In(values: Seq[Any]) extends Pred
/** Named predicate from the function registry (`(Column, DataType) => Column`). */
final case class PredFn(name: String) extends Pred
final case class Not(p: Pred) extends Pred
final case class And(a: Pred, b: Pred) extends Pred
final case class Or(a: Pred, b: Pred) extends Pred
