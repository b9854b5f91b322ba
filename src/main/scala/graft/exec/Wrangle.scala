package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.compile.{Compiler, TypedCol}
import graft.model.PipelineSpec

/** Dataset-level executors — the engine's equivalents of the reference
  * pipeline's entry points (/root/reference/wrangle_pypes/pipeline.py:35-104).
  *
  * Everything is one declarative Spark plan per call: `wrangle` is a single
  * nested projection (`create_multiple` ≡ lazy Dataset, SURVEY.md §3 EP1);
  * `getOrCreate` replaces the reference's per-row external lookup (an N+1
  * pattern, pipeline.py:78) with one set-oriented left-outer join — at 100 TB
  * the dimension side is broadcast when small, shuffled-hash/SMJ otherwise,
  * chosen by Catalyst/AQE.
  */
object Wrangle {

  /** The whole input row as the "datapoint" fed to every field AST.
    * Catalyst's SimplifyExtractValueOps collapses
    * `struct(a,b,c).getField("a")` back to `a`, so column pruning and
    * pushdown still reach the scan. */
  def rowCol(df: DataFrame): TypedCol =
    TypedCol(struct(df.columns.map(col).toSeq: _*), df.schema)

  /** `pipeline.create_multiple(Model, data)` — one nested projection.
    * Output columns = the model's declared fields, in spec order. */
  def wrangle(df: DataFrame, spec: PipelineSpec, model: String): DataFrame = {
    val ctx = Compiler.Ctx(spec, stack = List(model))
    val in = rowCol(df)
    val cols = spec(model).fields.map { f =>
      Compiler.compileField(model, f.name, f.t, in, ctx).col.as(f.name)
    }
    df.select(cols: _*)
  }

  /** `pipeline.get_or_create(_multiple)` (pipeline.py:53-104) as one join.
    *
    * `incoming` is the already-wrangled candidate records (same columns as
    * `dim`); `keys` are the reference's `match_targets` (all columns when
    * None, pipeline.py:71-77). Result: for a hit, the *existing* dim record;
    * for a miss, the built record — plus a `created` flag. This implements
    * the reference's intended miss semantics (its own miss path crashes on an
    * unbound variable, pipeline.py:81-82 — documented deviation SURVEY §2.1).
    *
    * Scale note (SURVEY §7.3): the set formulation dedups probes against the
    * dim once per join, not once per row; duplicate incoming keys each get
    * the same hit/miss verdict, matching reference behavior where the store
    * is not mutated mid-stream.
    *
    * @param broadcastDim hint when the dimension is small (the common
    *                     reference-store case); otherwise let AQE pick. */
  def getOrCreate(incoming: DataFrame, dim: DataFrame, keys: Seq[String],
                  broadcastDim: Boolean = true,
                  createdCol: String = "created"): DataFrame = {
    require(keys.nonEmpty, "match_targets must be non-empty")
    val outCols = incoming.columns.toSeq
    require(outCols.forall(dim.columns.contains),
      "dim must contain every incoming column")
    val d0 = dim.select(outCols.map(col): _*)
    val d = if (broadcastDim) broadcast(d0) else d0
    val b = incoming.alias("b")
    val dd = d.alias("d")
    val cond = keys.map(k => col(s"b.$k") <=> col(s"d.$k")).reduce(_ && _)
    val hit = col(s"d.${keys.head}").isNotNull
    val projected = outCols.map { c =>
      when(hit, col(s"d.$c")).otherwise(col(s"b.$c")).as(c)
    }
    b.join(dd, cond, "left")
      .select(projected :+ (!hit).as(createdCol): _*)
  }

  /** The "insert the misses" half of an upsert: records not present in the
    * dim (left-anti join) — the set-oriented shape a sink-side MERGE wants. */
  def newRecords(incoming: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(dim.select(keys.map(col): _*), keys, "left_anti")

  /** Compile a single field AST to a named column against `df`'s row —
    * the engine's `build_kwarg` (pipeline.py:119-135). */
  def field(df: DataFrame, spec: PipelineSpec, model: String, fieldName: String): Column = {
    val ms = spec(model)
    val f = ms.fields.find(_.name == fieldName).getOrElse(
      throw new graft.compile.PlanException(s"unknown field $model.$fieldName"))
    Compiler.compileField(model, fieldName, f.t, rowCol(df), Compiler.Ctx(spec, List(model))).col.as(fieldName)
  }
}
