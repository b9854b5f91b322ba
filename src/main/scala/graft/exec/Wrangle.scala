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

  /** Runtime error handling (reference §1.3, pipeline.py:128-148):
    *  - [[FailFast]]: Spark 4's default ANSI mode already raises on bad
    *    casts / invalid access, matching the reference's re-raise; BOTH
    *    plan-time and runtime errors carry `failed @ Model.field: Op`
    *    provenance ([[graft.functions.WithErrorContext]] for runtime).
    *  - [[Permissive]]: each chain node is wrapped in a runtime guard — a
    *    failing field yields NULL and appends `(model, field, op)` to an
    *    `_errors` array column, `op` naming the first failing
    *    transformation, the reference's per-node provenance triple. */
  sealed trait ErrorMode
  case object FailFast extends ErrorMode
  case object Permissive extends ErrorMode

  val ErrorsCol = "_errors"

  /** The whole input row as the "datapoint" fed to every field AST.
    * Catalyst's SimplifyExtractValueOps collapses
    * `struct(a,b,c).getField("a")` back to `a`, so column pruning and
    * pushdown still reach the scan. */
  def rowCol(df: DataFrame): TypedCol =
    TypedCol(struct(df.columns.map(col).toSeq: _*), df.schema)

  /** Wrap a column so runtime evaluation errors yield NULL instead of
    * failing the job. The inner `struct` distinguishes "legitimately NULL"
    * (struct(null) — not null) from "threw" (TryEval → null struct). */
  private def tryField(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.TryEval(
        GraftColumnBridge.expression(struct(c.as("v")))))
  }

  /** Conservative "can this expression raise at runtime" test, applied to
    * ANALYZED (resolved) trees — pre-resolution Columns are opaque
    * `ColumnNodeExpression` wrappers. ANSI mode makes casts, arithmetic,
    * and collection access fail-fast; pure column plumbing (refs, struct
    * build/extract, collection reshaping, literals, comparisons, boolean
    * logic) cannot throw, and a TryEval subtree swallows its own errors.
    * Unknown nodes count as throwing. Used to elide the FailFast
    * provenance wrapper: wrapping a non-throwing field would cost nothing
    * at runtime but would make the column opaque to data-source filter
    * translation, losing parquet pushdown through wrangled fields. */
  private def canThrow(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case _: TryEval => false
      case _: AttributeReference | _: Literal | _: Alias | _: GetStructField |
           _: GetArrayStructFields | _: CreateNamedStruct | _: CreateArray |
           _: CreateMap | _: MapKeys | _: MapValues | _: MapEntries |
           _: ArrayTransform | _: ArrayFilter | _: MapFilter |
           _: TransformKeys | _: TransformValues | _: LambdaFunction |
           _: NamedLambdaVariable | _: Flatten |
           _: IsNull | _: IsNotNull | _: Not |
           _: And | _: Or | _: EqualTo | _: EqualNullSafe | _: LessThan |
           _: LessThanOrEqual | _: GreaterThan | _: GreaterThanOrEqual |
           _: Coalesce | _: If | _: CaseWhen | _: Size | _: Length |
           _: KnownNotNull =>
        e.children.exists(canThrow)
      case _ => true
    }
  }

  /** `pipeline.create_multiple(Model, data)` — one nested projection.
    * Output columns = the model's declared fields, in spec order; in
    * [[Permissive]] mode a trailing `_errors` column carries the
    * per-row provenance of failed fields. */
  def wrangle(df: DataFrame, spec: PipelineSpec, model: String,
              mode: ErrorMode = FailFast): DataFrame = {
    val ctx = Compiler.Ctx(spec, stack = List(model))
    val in = rowCol(df)
    mode match {
      case FailFast =>
        // Runtime provenance (reference pipeline.py:128-135): a bad ANSI
        // cast mid-job surfaces as `failed @ Model.field: Op: msg`, not a
        // bare Spark exception. Throwability is judged on the RESOLVED
        // projection (one extra analysis pass, plan-time only); fields
        // that cannot throw skip the wrapper so their filters still
        // translate to parquet pushdown.
        import org.apache.spark.sql.GraftColumnBridge
        import org.apache.spark.sql.catalyst.plans.logical.Project
        val compiled = spec(model).fields.map { f =>
          (f, Compiler.compileField(model, f.name, f.t, in, ctx).col)
        }
        val probe = df.select(compiled.map { case (f, c) => c.as(f.name) }: _*)
        val throws: Seq[Boolean] = probe.queryExecution.analyzed match {
          case Project(ps, _) if ps.size == compiled.size => ps.map(canThrow)
          case _ => compiled.map(_ => true) // unexpected shape: wrap all
        }
        df.select(compiled.zip(throws).map { case ((f, c), t) =>
          val wrapped =
            if (t) GraftColumnBridge.column(graft.functions.WithErrorContext(
              GraftColumnBridge.expression(c),
              s"failed @ $model.${f.name}: ${Compiler.opName(f.t)}"))
            else c
          wrapped.as(f.name)
        }: _*)
      case Permissive =>
        // Per-node guards (reference pipeline.py:142-148): each chain
        // prefix gets its own TryEval, and the first failing prefix names
        // the `_errors.op` — `a|b|c` failing at `b` reports op "b", like
        // the reference naming the failing transformation. Prefixes share
        // subtrees; projection codegen CSE evaluates each op once.
        val guarded = spec(model).fields.map { f =>
          val prefixes =
            Compiler.compileFieldPrefixes(model, f.name, f.t, in, ctx)
          val tries = prefixes.map { case (op, tc) => (op, tryField(tc.col)) }
          val full = tries.last._2
          val errOp = coalesce(tries.map { case (op, t) =>
            when(t.isNull, lit(op)) }: _*)
          (f, full, errOp)
        }
        val values = guarded.map { case (f, g, _) => g.getField("v").as(f.name) }
        val errs = array_compact(array(guarded.map { case (f, g, errOp) =>
          when(g.isNull, struct(
            lit(model).as("model"), lit(f.name).as("field"),
            errOp.as("op")))
        }: _*)).as(ErrorsCol)
        df.select(values :+ errs: _*)
    }
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
    // Null-safe key equality (<=>) mirrors the reference's dict-style probe,
    // where a None key matches a stored None. Hit detection must then agree
    // with the join condition: testing d.<key> IS NOT NULL would misclassify
    // a NULL-key hit as a miss, so the dim side carries an explicit non-null
    // marker instead.
    val hitCol = "__graft_hit"
    val d0 = dim.select(outCols.map(col): _*).withColumn(hitCol, lit(true))
    val d = if (broadcastDim) broadcast(d0) else d0
    val b = incoming.alias("b")
    val dd = d.alias("d")
    val cond = keys.map(k => col(s"b.$k") <=> col(s"d.$k")).reduce(_ && _)
    val hit = col(s"d.$hitCol").isNotNull
    val projected = outCols.map { c =>
      when(hit, col(s"d.$c")).otherwise(col(s"b.$c")).as(c)
    }
    b.join(dd, cond, "left")
      .select(projected :+ (!hit).as(createdCol): _*)
  }

  /** Run a JSON-serialized spec (graft.model.SpecJson) — the
    * pipelines-as-data entry point: load a spec from a file/catalog and
    * execute it without any host-language spec construction. */
  def wrangleJson(df: DataFrame, specJson: String, model: String,
                  mode: ErrorMode = FailFast): DataFrame =
    wrangle(df, graft.model.SpecJson.fromJson(specJson), model, mode)

  /** `match_targets = None` twin (pipeline.py:71-77): EVERY field of the
    * incoming record is the probe key, so a hit requires a dim row equal
    * on all fields. */
  def getOrCreateAll(incoming: DataFrame, dim: DataFrame,
                     broadcastDim: Boolean = true,
                     createdCol: String = "created"): DataFrame =
    getOrCreate(incoming, dim, incoming.columns.toSeq, broadcastDim, createdCol)

  /** Typed materialization (SURVEY §1.1: models ≡ case classes): wrangle
    * then bind the projection to `T`'s encoder — field names must match the
    * spec's field names. The Dataset stays lazy like the reference's
    * generator (pipeline.py:43-51). */
  def wrangleAs[T: org.apache.spark.sql.Encoder](df: DataFrame, spec: PipelineSpec,
                                                 model: String): org.apache.spark.sql.Dataset[T] =
    wrangle(df, spec, model).as[T]

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
