package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Sharding, TextAnalysis}

/** Driver-checked queries for training-set preparation: the reproducible
  * epoch shuffle with token-budget sharding, and the hashed-feature linear
  * quality classifier (the fastText-shaped scoring pass). */
object TrainPrepQueries {

  // ------------------------------------------------------ q_epoch_shuffle

  /** Deterministic epoch order + shard assignment over `documents`. The
    * Spark path runs the distributed two-phase prefix sum; the oracle is
    * the global-window twin — identical output proves the parallel
    * formulation exact. */
  def qEpochShuffle(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    Sharding.epochShuffle(d, "doc_id", "text", seed = 42L, budget = 4000L)
  }

  val qEpochShuffleSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  len(string_split_regex(lower(trim(text)), '[ \\t\\n\\f\\r]+'))::BIGINT AS n_tokens,
       |  ((doc_id % ${Sharding.HashMod}) * ${Sharding.HashMulA} + 42) % ${Sharding.HashMod} * ${Sharding.HashMulB} % ${Sharding.HashMod} AS h
       | FROM documents),
       |c AS (SELECT doc_id, h, n_tokens,
       |  coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
       | FROM t)
       |SELECT doc_id, h, n_tokens, cum_before,
       |  (cum_before // 4000)::BIGINT AS shard,
       |  row_number() OVER (PARTITION BY cum_before // 4000 ORDER BY h, doc_id) AS pos
       |FROM c""".stripMargin

  // ------------------------------------------------- q_quality_classifier

  /** Hashed bag-of-words linear scorer: token → polynomial hash →
    * feature bucket (mod [[FeatDim]]) → fixed weight; margin = Σw/√n.
    * The weights are derived from the bucket index by a closed-form
    * recipe so the oracle can evaluate the identical model — in
    * production they'd arrive as a broadcast table from an offline
    * trainer; the Spark-side plumbing (hashing-trick featurization, one
    * codegen'd projection, no shuffle) is the real thing. */
  val FeatDim = 4096

  def qQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val tokHash = (t: org.apache.spark.sql.Column) =>
      aggregate(split(t, ""), lit(0L),
        (h, c) => (h * 31L + ascii(c)) % TextAnalysis.FingerprintMod)
    val weight = (t: org.apache.spark.sql.Column) =>
      ((tokHash(t) % FeatDim) * 37L + 11L) % 997L / lit(997.0) - lit(0.5)
    val margin = aggregate(toks, lit(0.0), (acc, t) => acc + weight(t)) /
      sqrt(greatest(size(toks), lit(1)).cast("double"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), margin.as("margin"),
        (margin > 0).as("keep"))
  }

  val qQualityClassifierSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  string_split_regex(lower(trim(text)), '[ \\t\\n\\f\\r]+') AS toks FROM documents),
       |m AS (SELECT doc_id,
       |  list_reduce(list_prepend(0.0, list_transform(toks, t ->
       |    ((list_reduce(list_prepend(0::BIGINT,
       |        list_transform(range(1, length(t) + 1), i -> ascii(t[i])::BIGINT)),
       |      (h, c) -> (h * 31 + c) % ${TextAnalysis.FingerprintMod})
       |     % $FeatDim) * 37 + 11) % 997 / 997.0 - 0.5)),
       |    (a, w) -> a + w)
       |  / sqrt(greatest(len(toks), 1)::DOUBLE) AS margin
       | FROM t)
       |SELECT doc_id, margin, margin > 0 AS keep FROM m""".stripMargin

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_epoch_shuffle"      -> (qEpochShuffle _),
    "q_quality_classifier" -> (qQualityClassifier _))

  val oracle: Map[String, String] = Map(
    "q_epoch_shuffle"      -> qEpochShuffleSql,
    "q_quality_classifier" -> qQualityClassifierSql)
}
