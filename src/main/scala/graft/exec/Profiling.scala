package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Dataset profiling: per-column row count / non-null count / distinct
  * count / min / max — the data-quality summary a pipeline runs before
  * trusting an input drop.
  *
  * One aggregation pass over the table produces every metric (Catalyst
  * plans the multi-distinct via Expand); the single result row is then
  * melted to one row per column. min/max are rendered as strings so
  * heterogeneous column types share one schema — callers profile
  * integral/string columns when cross-engine string parity matters
  * (float→text formatting is engine-specific). */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__nonnull"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      min(col(c)).cast(StringType).as(s"${c}__min"),
      max(col(c)).cast(StringType).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__total").as("total"),
        col(s"${c}__nonnull").as("nonnull"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"))
    }: _*)).as("p"))
      .select(col("p.column"), col("p.total"), col("p.nonnull"),
        col("p.n_distinct"), col("p.min_v"), col("p.max_v"))
  }
}
