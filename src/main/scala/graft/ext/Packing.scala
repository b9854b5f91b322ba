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
  /** FILL-IN-THE-MIDDLE transformation (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle" — public): a
    * deterministic per-document rewrite that teaches infilling by moving
    * a middle span behind its context. Per selected document the text
    * splits at two hash-derived character offsets into (prefix, middle,
    * suffix) and re-assembles as
    *
    *  - PSM: `<fim_prefix>` p `<fim_suffix>` s `<fim_middle>` m
    *  - SPM: `<fim_prefix><fim_suffix>` s `<fim_middle>` p m
    *
    * with mode and selection also hash-derived (rate = `fimPercent` of
    * docs; the rest pass through as mode `raw`). Everything — selection,
    * split points, assembly — is the engine's two-stage modular hash
    * ([[Sharding.shuffleKey]]) on the id plus pure string arithmetic,
    * so any engine reproduces the transform byte-for-byte (the oracle
    * replays it in SQL): no RNG, no per-row code, one codegen'd
    * projection over the corpus scan. Documents shorter than 2 chars
    * cannot split and stay `raw`. Output: (idCol, mode, text_fim,
    * n_chars). */
  def fimTransform(docs: DataFrame, textCol: String, idCol: String,
                   seed: Long, fimPercent: Int = 90): DataFrame = {
    require(fimPercent >= 0 && fimPercent <= 100, "fimPercent in [0, 100]")
    val id = col(idCol).cast("long")
    val len = length(col(textCol))
    // coalesce: NULL text makes `len >= 2` NULL, which would fall past
    // the raw branch into psm/spm and concat the document away to NULL —
    // NULL text must pass through as mode `raw` like any unsplittable doc
    val selected = coalesce(
      Sharding.shuffleKey(id, seed) % 100 < fimPercent && len >= 2,
      lit(false))
    // p1 in [1, len-1]: prefix is text[1..p1]; p2 in [p1, len]: middle is
    // text[p1+1..p2], suffix the rest — every split is representable,
    // including empty middle (p2 = p1) and empty suffix (p2 = len)
    // greatest-guard: p1 only matters when selected (len >= 2), but the
    // guard keeps the modulus positive even if an engine evaluates the
    // expression eagerly for unselected rows (ANSI % 0 is an error)
    val p1 = lit(1) +
      (Sharding.shuffleKey(id, seed + 1) % greatest(len - 1, lit(1))).cast("int")
    val p2 = p1 +
      (Sharding.shuffleKey(id, seed + 2) % greatest(len - p1 + 1, lit(1))).cast("int")
    val p = substring(col(textCol), lit(1), p1)
    val m = col(textCol).substr(p1 + 1, p2 - p1)
    val sfx = col(textCol).substr(p2 + 1, len - p2)
    val spm = Sharding.shuffleKey(id, seed + 3) % 2 === 0
    val mode = when(!selected, lit("raw"))
      .when(spm, lit("spm")).otherwise(lit("psm"))
    val out = when(!selected, col(textCol))
      .when(spm, concat(lit("<fim_prefix><fim_suffix>"), sfx,
        lit("<fim_middle>"), p, m))
      .otherwise(concat(lit("<fim_prefix>"), p, lit("<fim_suffix>"), sfx,
        lit("<fim_middle>"), m))
    docs.select(col(idCol), mode.as("mode"), out.as("text_fim"))
      .withColumn("n_chars", length(col("text_fim")).cast("long"))
  }

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
