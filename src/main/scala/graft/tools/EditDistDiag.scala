package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.EditDistance

/** Slope-audit diagnostic for q_editdist_join (VERDICT r10 #1): measure
  * the quantities that explain the bench slope — emitted pair count and
  * verify-candidate count — at two scale fixtures, so the SCALE artifact
  * note can cite MEASURED output growth instead of a story.
  *
  * The 10x fixture (graft.tools.ScaleUp) prefixes document copy i >= 1
  * with "v<i> ": the 40-char prefixes of copies i,j >= 1 of the SAME
  * document differ by one substitution, so every document contributes
  * C(factor-1, 2) new true pairs at tau=3 — emitted pairs grow
  * super-linearly BY CONSTRUCTION of the fixture, and per-pair cost is
  * what the slope must be judged against.
  *
  * Usage: runMain graft.tools.EditDistDiag <dir1> [<dir2> ...]
  * Prints one JSON line per dir: {dir, rows, candidates, pairs}. */
object EditDistDiag {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val d = Tables(spark, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 40).as("s"))
      val rows = d.count()
      val t0 = System.nanoTime()
      val cands = EditDistance.candidateCount(d, "s", "doc_id", tau = 3)
      val t1 = System.nanoTime()
      val pairs = EditDistance.editDistancePairs(d, "s", "doc_id", tau = 3).count()
      val t2 = System.nanoTime()
      println(s"""{"dir":"$dir","rows":$rows,"candidates":$cands,""" +
        s""""pairs":$pairs,"t_cand_sec":${(t1 - t0) / 1e9},""" +
        s""""t_pairs_sec":${(t2 - t1) / 1e9}}""")
    }
    spark.stop()
  }
}
