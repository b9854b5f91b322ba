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

  /** Point-in-time (as-of) join: for each left row, ONE right row per key —
    * `direction = "backward"` (default): most recent right with
    * `rightTs <= leftTs`; `"forward"`: earliest right with
    * `rightTs >= leftTs`; `"nearest"`: whichever of the two is closer in
    * time (ties go backward). Unmatched left rows keep NULL right columns
    * (left-join semantics). `rightPrefix` disambiguates the right's
    * columns in the output.
    *
    * Algorithm (all directions): union both sides tagged, ONE shuffle +
    * sort per key on (ts, side) with right-before-left at equal
    * timestamps, then carry the adjacent right record with window frames —
    * unbounded-preceding `last` for backward, current-to-unbounded-
    * following `first` for forward (equal-ts rights sort before the left
    * row, so the forward frame is strictly-after; the `>=` tie case is
    * covered by the backward carry, which is why "nearest" composes
    * correctly). Never a per-row probe, never an inequality nested loop. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPrefix: String = "r_",
           tolerance: Option[String] = None,
           direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction), direction)
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
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val union = l.unionByName(r)
    val carried = (direction match {
      case "backward" =>
        union.withColumn("__m", last(col("__r"), ignoreNulls = true).over(wb))
      case "forward" =>
        union.withColumn("__m",
          coalesce(
            // equal-ts right rows sort before the left row: they belong to
            // the >= match set but live in the preceding frame, so take
            // them from a backward carry restricted to equal timestamps
            when(last(col("__r"), ignoreNulls = true).over(wb)
              .getField(rightTs) === col("__ts"),
              last(col("__r"), ignoreNulls = true).over(wb)),
            first(col("__r"), ignoreNulls = true).over(wf)))
      case "nearest" =>
        val b = last(col("__r"), ignoreNulls = true).over(wb)
        val f = first(col("__r"), ignoreNulls = true).over(wf)
        union.withColumn("__m",
          when(b.isNull, f).when(f.isNull, b)
            .when(col("__ts") - b.getField(rightTs)
              <= f.getField(rightTs) - col("__ts"), b)
            .otherwise(f))
    }).filter(col("__side") === 1)
    val withTol = tolerance match {
      case Some(tol) =>
        // |Δt| ≤ tol in epoch-micros — direction-agnostic (forward matches
        // have negative leftTs - rightTs); the timestamp_micros(0) round
        // trip converts the interval literal to micros independent of the
        // session timezone.
        val tolUs = expr(s"unix_micros(timestamp_micros(0) + INTERVAL '$tol')")
        carried.withColumn("__m",
          when(col("__m").isNotNull &&
            abs(unix_micros(col("__ts")) -
              unix_micros(col("__m").getField(rightTs))) <= tolUs,
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

  /** Bloom-prefiltered EXACT semi join: build a bloom over the filter
    * side's keys, broadcast the bits, drop big-side rows that cannot
    * match (no false negatives — the sketch only passes extras), then
    * settle survivors with a real semi join. Same result as a plain
    * left_semi — asserted in JoinsSpec and oracle-checked — but the big
    * side shrinks BEFORE the join machinery: the 100 TB pattern for a
    * filter side too large to hash-broadcast (a bloom holds ~10⁸ keys in
    * 64 MB of bits), which is exactly what Spark's own runtime shuffle
    * filters do inside the optimizer. Keys are hashed with xxhash64, so
    * any key type works. */
  def bloomSemiJoin(big: DataFrame, keyCol: String,
                    filterSide: DataFrame, filterKeyCol: String,
                    estimatedItems: Long = 1000000L,
                    numBits: Long = 8388608L): DataFrame = {
    import graft.functions.BloomFunctions._
    // The filter side feeds TWO actions — the bloom aggregate and the
    // settling semi join — so its distinct key projection is materialized
    // once (localCheckpoint); without it the whole filter-side pipeline
    // would execute twice, doubling its cost at the scale this exists for.
    val keys = filterSide.select(col(filterKeyCol).as(keyCol))
      .distinct().localCheckpoint()
    // might_contain demands a CONSTANT (or scalar-subquery) sketch, so the
    // aggregate materializes first and ships as a binary literal — the
    // same two-phase execution the optimizer's own runtime filters use.
    val bfBytes = keys
      .agg(bloomAgg(xxhash64(col(keyCol)), estimatedItems, numBits))
      .collect().head.getAs[Array[Byte]](0)
    big.where(mightContain(lit(bfBytes), xxhash64(col(keyCol))))
      .join(keys, Seq(keyCol), "left_semi")
  }

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
