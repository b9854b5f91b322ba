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
  * Shape: a value histogram + two-level cumulative counts.
  *
  *  1. `groupBy(group, value).count()` — one map-side-combined shuffle;
  *     output is |distinct values|, never more than the fact table and
  *     usually far less (ties collapse).
  *  2. Each distinct value gets a deterministic monotone bucket (linear
  *     in value space, `buckets` cells per group). Bucket subtotals +
  *     a per-group cumulative window over ≤ `buckets` rows (bounded,
  *     NOT data-scaled) locate which bucket contains each requested
  *     rank position, with the global count of everything below it.
  *  3. Only the boundary buckets' value slices (expected
  *     |distinct| / buckets rows each) get a local cumulative window,
  *     partitioned by (group, bucket) — bounded slices, parallel across
  *     buckets — and the row whose cumulative range covers position k
  *     yields the exact value.
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
    * @param buckets   level-1 histogram cells per group (bounded constant
    *                  — the only per-group single-task window runs over
    *                  at most this many rows)
    * @return one row per group: (group, positions.map(_._1)*)
    */
  def valuesAt(fact: DataFrame, group: String, value: String,
      positions: Seq[(String, Column => Column)],
      buckets: Int = 4096): DataFrame = {
    val g = col(group)
    val v = col(value)

    // 1. value histogram — the ONLY pass over the fact table
    val h = fact.groupBy(g, v).agg(count(lit(1)).as("cnt"))

    // tiny per-group frame: row count + value range for the bucket map.
    // Branches below re-consume `h`; they share its shuffle via AQE
    // exchange reuse (same subtree), so the fact scan happens once.
    val gstats = h.groupBy(g).agg(
      sum("cnt").as("n"),
      min(v).as("vmin"), max(v).as("vmax"))

    // deterministic monotone bucket: linear in value space. Equal values
    // get equal buckets; order of buckets follows order of values.
    val hb = h.join(broadcast(gstats.select(g, col("vmin"), col("vmax"))),
        Seq(group))
      .withColumn("bkt",
        when(col("vmax") <= col("vmin"), lit(0L)).otherwise(
          least(
            floor((v.cast("double") - col("vmin").cast("double")) *
              buckets / (col("vmax").cast("double") - col("vmin").cast("double"))),
            lit(buckets - 1L))).cast("long"))
      .select(g, v, col("cnt"), col("bkt"))

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

    // 3. local cumulative count inside ONLY the boundary buckets'
    //    slices; the covering row names the exact rank-k value.
    val w2 = Window.partitionBy(g, col("bkt"), col("pname")).orderBy(v)
    val vals = hb.join(broadcast(pb), Seq(group, "bkt"))
      .withColumn("chi", sum("cnt").over(w2) + col("blo"))
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
