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

  /** Shard-count cap: at the cap, a corpus of 10^14 tokens still leaves
    * ~10^8 tokens (~hundreds of thousands of rows) per shard window. */
  val MaxShards: Long = 1L << 20

  /** Target packed sequences per shard when auto-scaling: each shard's
    * cumulative-sum window then handles ~`budget * TargetSeqsPerShard`
    * tokens regardless of corpus size. */
  val TargetSeqsPerShard: Long = 64L

  /** Pack documents into `budget`-token bins.
    *
    * `shards <= 0` (the default) derives the shard count from the TOTAL
    * token count: `clamp(total div (budget * TargetSeqsPerShard) + 1,
    * 1, MaxShards)` — so per-shard window state stays ~constant as the
    * corpus grows 100×, instead of a fixed shard count turning each
    * window partition into a monolithic sort. The derivation is exact
    * integer arithmetic on one broadcast scalar (any engine reproduces
    * it), and the per-document decision stays map-side. A positive
    * `shards` pins the count explicitly. */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
                    budget: Long, shards: Int = 0): DataFrame = {
    val toks0 = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val sharded =
      if (shards > 0) toks0.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      else {
        // The total-count branch and the windowed branch both consume the
        // tokenized frame, and nothing between them is a reusable
        // exchange — materialize it once or the corpus is TOKENIZED twice
        // (the dominant cost at scale). The checkpointed frame is two
        // longs per document, not the text.
        val toks = toks0.localCheckpoint()
        val total = toks.agg(coalesce(sum(col("n_tokens")), lit(0L)).as("__tot"))
        toks.crossJoin(broadcast(total))
          .withColumn("shard", pmod(col(idCol),
            greatest(lit(1L), least(lit(MaxShards),
              expr(s"__tot div ($budget * $TargetSeqsPerShard) + 1")))))
          .drop("__tot")
      }
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_in_shard", expr(s"(cum - n_tokens) div $budget"))
      .drop("cum")
      .select(col(idCol), col("shard"), col("n_tokens"), col("seq_in_shard"))
  }

  /** Materialize the packed training sequences: each (shard, seq) bin's
    * documents concatenated in id order, with doc/token counts. The
    * per-group collect is SAFE at scale because [[packSequences]] bounds
    * every bin at ≈ `budget` tokens by construction — group state is one
    * training sequence, not a corpus slice. Reassembly order is
    * deterministic (sort by id inside the aggregated structs), so the
    * output is reproducible across partitionings and engines. */
  def materializeSequences(docs: DataFrame, textCol: String, idCol: String,
                           budget: Long, shards: Int = 0): DataFrame = {
    val assigned = packSequences(docs, textCol, idCol, budget, shards)
    assigned.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col("shard"), col("seq_in_shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol))).as("sequence"))
  }
}
