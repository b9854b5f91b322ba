package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: assign documents to
  * fixed-token-budget bins so a downstream writer can concatenate each
  * bin into one training sequence.
  *
  * Shape at scale: a single global greedy pack would serialize on one
  * ordered partition, so documents are hash-sharded first and packed
  * independently within each shard — shards pack in parallel and the
  * assignment is fully deterministic (shard = id mod shards, order by id).
  * Binning is contiguous by start offset (`floor(startTokens / budget)`),
  * the standard offline approximation: a document may straddle a bin
  * boundary and bins are filled in id order, not best-fit. */
object Packing {

  def packSequences(docs: DataFrame, textCol: String, idCol: String,
                    budget: Long, shards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_in_shard", expr(s"(cum - n_tokens) div $budget"))
      .drop("cum")
  }
}
