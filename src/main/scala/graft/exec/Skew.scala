package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers beyond AQE's automatic skew-join split.
  *
  * [[saltedAgg]] is the classic two-phase aggregation for hot grouping
  * keys: phase 1 groups on (salt, keys) so a hot key's rows spread over
  * `salts` reducers; phase 2 combines the partials. Only valid for
  * reassociable aggregates — the caller supplies both phases explicitly,
  * keeping the combine law in the caller's hands (sum→sum, count→sum,
  * min→min, max→max...). */
object Skew {

  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partial: Seq[Column], combine: Seq[Column]): DataFrame = {
    require(partial.nonEmpty && partial.size == combine.size)
    // The salt must be DETERMINISTIC per row content: a partition-id /
    // monotonic-id salt changes on task retry, and regrouping recomputed
    // rows under a different salt during shuffle recovery can double-count
    // or drop them. Hashing every column gives a stable, well-spread salt
    // (identical rows share a salt, which only costs spread when a single
    // key+payload combination dominates — rare for real payloads).
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Skewed equi-join: the fact side gets a content-derived salt in
    * [0, salts) so a hot key's rows spread over `salts` reducers; the dim
    * side is replicated `salts`-way and the join runs on keys :+ salt.
    * For joins where AQE's skew split does not apply (e.g. the build side
    * is already partitioned, or the skew is dominated by a single key that
    * one split cannot break). Cost: dim scan × salts — use with
    * driver-small-to-medium dims, not two fact tables. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val saltCol = "__graft_salt"
    val saltedFact = fact.withColumn(saltCol,
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts.toLong)))
    val saltedDim = dim.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedFact.join(saltedDim, keys :+ saltCol, joinType).drop(saltCol)
  }
}
