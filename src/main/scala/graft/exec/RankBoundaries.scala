package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group rank-position statistics ("the value at
  * `row_number() = k` under ORDER BY value") computed WITHOUT any
  * whole-group sort — the scale-safe replacement for
  * `PARTITION BY low_cardinality_key ORDER BY value` windows over a fact
  * table, which put each group's ENTIRE sort in one task (3 groups at
  * 100 TB = a 3-task query).
  *
  * Shape: a value histogram + two-level cumulative counts, with one
  * recursive refinement of the boundary cell.
  *
  *  1. `groupBy(group, value).count()` — one map-side-combined shuffle;
  *     output is |distinct values|, never more than the fact table and
  *     usually far less (ties collapse).
  *  2. Each distinct value gets a deterministic monotone bucket: linear
  *     subdivision of the ORDER-PRESERVING IEEE-754 BIT RANGE
  *     ([[graft.functions.NumericExpressions.orderedBits]]), not of the
  *     value range. Bit space is exponent-first — logarithmic resolution
  *     where values crowd — so heavy-tailed data (exponential, power-law
  *     prices) spreads across cells instead of collapsing into cell 0
  *     the way a `(v - min) / (max - min)` map does when one outlier
  *     stretches the range. Bucket subtotals + a per-group cumulative
  *     window over ≤ `buckets` rows (bounded, NOT data-scaled) locate
  *     which bucket contains each requested rank position.
  *  3. The boundary bucket is REFINED once: its distinct values are
  *     re-bucketed by the same bit-range map over the bucket's own bit
  *     span (another ≤ `buckets`-row window), multiplying the effective
  *     resolution to `buckets²` cells. Only the final sub-bucket's value
  *     slice gets a local cumulative window, partitioned by
  *     (group, bucket, position, sub-bucket) — at the default 4096² ≈
  *     16.7M effective cells, a slice holds |distinct| / 16.7M expected
  *     rows (StatsSpec asserts a constant bound on exponential and
  *     power-law fixtures).
  *
  * Equal values always share a bucket (the bucket is a pure function of
  * the value), so cross-bucket tie-splitting cannot occur and the
  * selected value is exactly the one a monolithic
  * `row_number() OVER (PARTITION BY group ORDER BY value)` would pick at
  * position k — rank positions name a unique VALUE even when ranks are
  * tied on it. Oracles written against the window formulation therefore
  * hold unchanged.
  *
  * Reference behavior target: robust scaling / quantile clamps over the
  * documents+lineitem fixtures (see SURVEY.md §2.5 aggregation).
  */
object RankBoundaries {

  /** Monotone bucket of `bits` within `[lo, hi]`: linear in bit space,
    * computed in double (precision loss only COARSENS cells — a monotone
    * rounding of a monotone map cannot reorder). */
  private def bucketOf(bits: Column, lo: Column, hi: Column,
                       buckets: Int): Column =
    when(hi <= lo, lit(0L)).otherwise(
      least(
        floor((bits.cast("double") - lo.cast("double")) * buckets /
          (hi.cast("double") - lo.cast("double"))),
        lit(buckets - 1L))).cast("long")

  /** The shared pipeline: (final boundary slice, its window spec inputs).
    * Columns of the returned frame: group, bkt, pname, bkt2, v, cnt, k,
    * blo2 — the final window partitions by (group, bkt, pname, bkt2). */
  private def boundarySlice(fact: DataFrame, group: String, value: String,
      positions: Seq[(String, Column => Column)], buckets: Int): DataFrame = {
    val g = col(group)
    val v = col(value)

    // 1. value histogram — the ONLY pass over the fact table — plus the
    // order-preserving bit image every bucketing level maps from
    val h = fact.groupBy(g, v).agg(count(lit(1)).as("cnt"))
      .withColumn("bits", graft.functions.NumericExpressions.orderedBits(v))

    // tiny per-group frame: row count + bit range for the bucket map.
    // Branches below re-consume `h`; they share its shuffle via AQE
    // exchange reuse (same subtree), so the fact scan happens once.
    val gstats = h.groupBy(g).agg(
      sum("cnt").as("n"),
      min("bits").as("bmin"), max("bits").as("bmax"))

    val hb = h.join(broadcast(gstats.select(g, col("bmin"), col("bmax"))),
        Seq(group))
      .withColumn("bkt", bucketOf(col("bits"), col("bmin"), col("bmax"), buckets))
      .select(g, v, col("bits"), col("cnt"), col("bkt"))

    // 2. bucket subtotals + cumulative counts. The window partitions by
    //    group alone but runs over ≤ buckets rows per group — bounded by
    //    a constant, not by data size.
    val wB = Window.partitionBy(g).orderBy(col("bkt"))
    val l1 = hb.groupBy(g, col("bkt")).agg(sum("cnt").as("bcnt"))
      .withColumn("bhi", sum("bcnt").over(wB))
      .withColumn("blo", col("bhi") - col("bcnt"))

    // requested positions, one row per (group, position) — tiny
    val pos = gstats.select(g,
        explode(array(positions.map { case (name, k) =>
          struct(lit(name).as("pname"), k(col("n")).as("k")) }: _*)).as("p"))
      .select(g, col("p.pname"), col("p.k"))

    // which bucket holds each position (carries the global count below it)
    val pb = l1.join(broadcast(pos), Seq(group))
      .where(col("k") > col("blo") && col("k") <= col("bhi"))
      .select(g, col("bkt"), col("pname"), col("k"), col("blo"))

    // 3. refinement: re-bucket ONLY the boundary bucket's distinct values
    //    over the bucket's own bit span — buckets² effective cells. The
    //    cumulative window again runs over ≤ buckets rows per
    //    (group, bucket, position).
    val slice1 = hb.join(broadcast(pb), Seq(group, "bkt"))
    val s1 = slice1.groupBy(g, col("bkt"), col("pname")).agg(
      min("bits").as("bmin2"), max("bits").as("bmax2"))
    val hb2 = slice1.join(broadcast(s1), Seq(group, "bkt", "pname"))
      .withColumn("bkt2", bucketOf(col("bits"), col("bmin2"), col("bmax2"), buckets))
    val wB2 = Window.partitionBy(g, col("bkt"), col("pname")).orderBy(col("bkt2"))
    val l2 = hb2.groupBy(g, col("bkt"), col("pname"), col("k"), col("blo"),
        col("bkt2"))
      .agg(sum("cnt").as("bcnt2"))
      .withColumn("bhi2", sum("bcnt2").over(wB2) + col("blo"))
      .withColumn("blo2", col("bhi2") - col("bcnt2"))
    val pb2 = l2.where(col("k") > col("blo2") && col("k") <= col("bhi2"))
      .select(g, col("bkt"), col("pname"), col("bkt2"), col("k"), col("blo2"))

    hb2.drop("k", "blo", "bmin2", "bmax2")
      .join(broadcast(pb2), Seq(group, "bkt", "pname", "bkt2"))
  }

  /** Test probe: row count of every FINAL window partition (the only
    * window whose size is data-dependent) — StatsSpec asserts these stay
    * under a constant bound on heavy-tailed fixtures. */
  private[graft] def finalSliceSizes(fact: DataFrame, group: String,
      value: String, positions: Seq[(String, Column => Column)],
      buckets: Int = 4096): DataFrame =
    boundarySlice(fact, group, value, positions, buckets)
      .groupBy(col(group), col("bkt"), col("pname"), col("bkt2"))
      .agg(count(lit(1)).as("slice_rows"))

  /** Per-group values at the requested rank positions.
    *
    * @param fact      input frame
    * @param group     grouping column name (low cardinality)
    * @param value     ordering/value column name (numeric)
    * @param positions (outputName, n => positionExpr) — position is a
    *                  1-based rank computed from the group's row count
    *                  `n`; MUST use the same arithmetic as the oracle SQL
    *                  (e.g. `cast(ceil(0.5 * n) as bigint)`) so both
    *                  engines pick the identical position.
    * @param buckets   histogram cells per level (each bounded window runs
    *                  over at most this many rows; two levels = buckets²
    *                  effective cells)
    * @return one row per group: (group, positions.map(_._1)*)
    */
  def valuesAt(fact: DataFrame, group: String, value: String,
      positions: Seq[(String, Column => Column)],
      buckets: Int = 4096): DataFrame = {
    val g = col(group)
    val v = col(value)
    // local cumulative count inside ONLY the final sub-bucket slices;
    // the covering row names the exact rank-k value.
    val w2 = Window.partitionBy(g, col("bkt"), col("pname"), col("bkt2"))
      .orderBy(v)
    val vals = boundarySlice(fact, group, value, positions, buckets)
      .withColumn("chi", sum("cnt").over(w2) + col("blo2"))
      .where(col("k") > col("chi") - col("cnt") && col("k") <= col("chi"))
      .select(g, col("pname"), v.as("pval"))

    // pivot the (group, pname, value) rows back to one row per group
    vals.groupBy(g).agg(
      max(when(col("pname") === positions.head._1, col("pval")))
        .as(positions.head._1),
      positions.tail.map { case (n, _) =>
        max(when(col("pname") === n, col("pval"))).as(n) }: _*)
  }
}
