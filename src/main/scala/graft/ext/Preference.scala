package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Preference-data preparation for RLHF/DPO-style post-training.
  *
  * Public-algorithm provenance (ideas, not code): direct preference
  * optimization trains on (prompt, chosen, rejected) triples with a
  * score margin (Rafailov et al. 2023, "Direct Preference
  * Optimization"); best-of-n rejection sampling scores n candidates
  * per prompt and keeps the winner (Stiennon et al. 2020, "Learning to
  * summarize from human feedback"; Touvron et al. 2023, Llama 2).
  * Extension tier — no counterpart in the reference
  * (/root/reference/wrangle_pypes is record wrangling only).
  *
  * Float-parity note: scores are SELECTED (max/min/max_by), never
  * accumulated, so they stay bit-identical to the oracle's; the one
  * accumulated quantity (a batch mean) goes through the engine-exact
  * quantized decimal sum used everywhere else (see
  * graft.queries.Oracle.dsum — duplicated inline here because ext/
  * must not depend on the query layer).
  */
object Preference {

  /** DPO pair construction: per candidate group (prompt), chosen = the
    * highest-scored candidate, rejected = the lowest-scored; a pair is
    * emitted only when the score margin clears `minMargin` (weak
    * preferences make noisy DPO labels, so margin filtering is the
    * standard knob).
    *
    * Scale shape: ONE hash aggregate — map-side partial `max_by`/
    * `min_by`, a single shuffle on the group key, HAVING-style filter
    * after. No window over the corpus, no self-join, nothing on the
    * driver; at 100 TB the group key (prompt id) is high-cardinality,
    * exactly what hash aggregation wants. Ties break deterministically
    * to the smallest candidate id on both sides: the chosen ordering
    * key is (score, -id) maximized, the rejected key (score, id)
    * minimized.
    */
  def pairs(candidates: DataFrame, groupCols: Seq[String], idCol: String,
            scoreCol: String, minMargin: Double): DataFrame = {
    val g = candidates
      .filter(col(scoreCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_candidates"),
        expr(s"max_by($idCol, struct($scoreCol, -$idCol))").as("chosen_id"),
        max(col(scoreCol)).as("chosen_score"),
        expr(s"min_by($idCol, struct($scoreCol, $idCol))").as("rejected_id"),
        min(col(scoreCol)).as("rejected_score"))
    g.withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("n_candidates") >= 2 && col("margin") >= lit(minMargin))
  }

  /** Best-of-n rejection sampling over deterministic candidate batches:
    * within each group, candidates in `idCol` order are bucketed into
    * consecutive batches of `n` (each batch models one sampling round);
    * the batch winner is the highest-scored (ties to the smallest id).
    * Emits per batch the winner, its score, the batch's exact mean
    * score and the winner's uplift over that mean — the quantities a
    * rejection-sampling curriculum filters and monitors on.
    *
    * Scale shape: one window bounded by a single group's candidates
    * (never the corpus) to number the batch, then one hash aggregate
    * on (group, batch). The mean is the quantized-decimal exact sum,
    * so it is partition-order-independent.
    */
  def bestOfN(candidates: DataFrame, groupCols: Seq[String], idCol: String,
              scoreCol: String, n: Int): DataFrame = {
    require(n >= 2, s"best-of-n needs n >= 2, got $n")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
    val batched = candidates
      .filter(col(scoreCol).isNotNull)
      .withColumn("batch",
        ((row_number().over(w) - 1) / n).cast("long"))
    val qsum = sum(floor(col(scoreCol) * lit(1e7) + lit(0.5))
      .cast(DecimalType(27, 0))).cast(DoubleType) / lit(1e7)
    batched
      .groupBy((groupCols :+ "batch").map(col): _*)
      .agg(
        count(lit(1)).as("n_in_batch"),
        expr(s"max_by($idCol, struct($scoreCol, -$idCol))").as("best_id"),
        max(col(scoreCol)).as("best_score"),
        (qsum / count(lit(1))).as("pool_avg"))
      .withColumn("uplift", col("best_score") - col("pool_avg"))
  }
}
