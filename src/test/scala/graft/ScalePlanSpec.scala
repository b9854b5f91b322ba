package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.scalatest.funsuite.AnyFunSuite

/** Structural scale-safety sweep over EVERY driver query: none may plan
  * an unbounded Cartesian product. A cross join that slips into a plan
  * is invisible at fixture scale and fatal at 100 TB — this is the one
  * shape no amount of cluster sizing survives, so it is asserted
  * wholesale rather than query by query.
  *
  * One documented exception: the edit-distance family's short-string
  * corner joins strings of length ≤ 2τ with no usable segment key — a
  * provably bounded set (EditDistance.scala) — and one-row scalar
  * frames cross-joined for totals plan as BroadcastNestedLoopJoin, not
  * CartesianProductExec, so they pass untouched. */
class ScalePlanSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  val dir = "/root/testdata/sf0.001"

  /** Queries whose construction PERFORMS the pipeline (standing-index
    * lifecycles, streaming runs, driver-replay companions) and returns a
    * read of the result — their final frame is a scan, and their
    * interior plans are covered by their own specs. Skipping them keeps
    * this sweep a plan-only pass (construction must still succeed). */
  private val lifecycle = Set(
    "q_chunk_idx", "q_chunk_delete", "q_curation_incr", "q_curation_stats",
    "q_stream_lifecycle", "q_cdc_incr", "q_dataloader_resume",
    "q_stream_dedup_lifecycle", "q_stream_dedup_readmit",
    "q_stream_ann_lifecycle", "q_stream_ann_readmit",
    "q_stream_chunk_lifecycle", "q_stream_span_lifecycle")

  test("no driver query plans an unbounded Cartesian product") {
    val shortStringCross = Set("q_editdist_join", "q_editdist_lookup",
      "q_fuzzy_lookup")
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !lifecycle.contains(name)) {
      val df = fn(spark, dir)
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val crosses = root.collect { case c: CartesianProductExec => c }
      if (crosses.nonEmpty && !shortStringCross.contains(name))
        offenders += s"$name (${crosses.size} CartesianProductExec)"
    }
    assert(offenders.isEmpty,
      s"unbounded cross joins planned by: ${offenders.mkString(", ")}")
  }
}
