package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Extended join surface (SURVEY.md §2.5 joins row): as-of and range joins,
  * which Spark's built-in operators don't provide directly.
  *
  * Both are expressed as compositions that keep scale characteristics
  * sane (the task's preference order (a)):
  *  - as-of: ONE shuffle on the keys + a sorted window pass — the
  *    union-and-carry-forward algorithm, not a per-row probe and not an
  *    inequality nested-loop join;
  *  - range: interval bucketization so the join is an equi-join on
  *    (bucket), with the exact range predicate applied post-match — cost
  *    proportional to true matches per bucket, not |L|×|R|. */
object Joins {

  /** Point-in-time (as-of backward) join: for each left row, the single
    * most recent right row with `rightTs <= leftTs`, per key; unmatched
    * left rows keep NULL right columns (left-join semantics).
    *
    * `rightPrefix` disambiguates the right's columns in the output
    * (`<prefix><col>` for every right column except the keys).
    *
    * Algorithm: union both sides tagged, sort per key by (ts, side) with
    * right-before-left at equal timestamps (so an exactly-simultaneous
    * right row matches), carry the last non-null right record forward with
    * an unbounded-preceding window, keep left rows. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPrefix: String = "r_",
           tolerance: Option[String] = None): DataFrame = {
    val rightCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(structType(right, rightCols)).as("__r")): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(structType(left, leftCols)).as("__l") :+
        struct(rightCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withTol = tolerance match {
      case Some(tol) =>
        carried.withColumn("__m",
          when(col("__m").isNotNull &&
            col("__ts") - col("__m").getField(rightTs) <= expr(s"INTERVAL '$tol'"),
            col("__m")))
      case None => carried
    }
    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      rightCols.map(c => col("__m").getField(c).as(s"$rightPrefix$c"))
    withTol.select(out: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(df.schema.fieldIndex(c))))

  /** Interval (range) join: left rows against right intervals `[lo, hi)`,
    * inner semantics. `bucketWidth` trades replication of wide intervals
    * against bucket fan-in; pick ~ the typical interval width. */
  def range(left: DataFrame, leftVal: String,
            right: DataFrame, lo: String, hi: String,
            bucketWidth: Double): DataFrame = {
    val lb = left.withColumn("__b", floor(col(leftVal) / bucketWidth).cast(LongType))
    val rb = right.withColumn("__b",
      explode(sequence(
        floor(col(lo) / bucketWidth).cast(LongType),
        floor(col(hi) / bucketWidth).cast(LongType))))
    lb.join(rb, Seq("__b"))
      .filter(col(leftVal) >= col(lo) && col(leftVal) < col(hi))
      .drop("__b")
  }
}
