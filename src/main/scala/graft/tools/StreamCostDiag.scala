package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.DedupIndex

/** Phase-level cost profile of the q_stream_dedup_readmit lifecycle —
  * the shape shared by every q_stream_* proof (bulk build, streamed
  * ingestion legs on one checkpoint, takedown, partial compaction,
  * re-admission): prints one wall-clock line per phase so "attack the
  * streaming fixed costs" starts from a measurement instead of a guess.
  *
  * Usage: runMain graft.tools.StreamCostDiag <sfDir> */
object StreamCostDiag {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .appName("graft-stream-cost-diag").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm scan path
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[diag] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    import org.apache.spark.sql.streaming.Trigger
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_scdiag").toString
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
    val idx = "t_scdiag_idx"
    DedupIndex.write(docs.limit(1), "text", "doc_id", "lang", idx,
      threshold = 0.5) // throwaway: JVM/codegen warm for the build path
    val takedown = docs
      .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 3 === 1)
      .orderBy("doc_id").limit(40).localCheckpoint()
    val inDir = s"$scratch/in"
    def leg(): Unit = {
      val q = graft.streaming.IngestDedup.run(
          spark.readStream.schema(docs.schema).parquet(inDir),
          base = idx, textCol = "text", idCol = "doc_id", blockCol = "lang",
          threshold = 0.5, verdictPath = s"$scratch/verdicts",
          checkpoint = s"$scratch/ckpt", updateIndex = true)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    phase("build")(DedupIndex.write(docs.filter(col("doc_id") % 5 =!= 0),
      "text", "doc_id", "lang", idx, threshold = 0.5))
    docs.filter(col("doc_id") % 10 === 0).coalesce(1)
      .write.mode("overwrite").parquet(inDir)
    phase("leg1")(leg())
    phase("delete")(DedupIndex.delete(spark, idx,
      takedown.select(col("doc_id")), "doc_id"))
    docs.filter(col("doc_id") % 10 === 5).coalesce(1)
      .write.mode("append").parquet(inDir)
    phase("leg2")(leg())
    phase("compactPartial")(DedupIndex.compactPartial(spark, idx))
    takedown.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(inDir)
    phase("leg3")(leg())
    phase("read")(spark.read.parquet(s"$scratch/verdicts").count())
    // decomposition: pure stream machinery (no new files), the probe
    // alone, and the append alone — what a leg's time is made of
    phase("leg_noop")(leg())
    val b = docs.filter(col("doc_id") % 10 === 7).localCheckpoint()
    val edges = phase("probe_only")(
      DedupIndex.matchEdges(spark, idx, b, "text", "doc_id", "lang", 0.5)
        .localCheckpoint())
    val verd = DedupIndex.verdictsFromEdges(b, "doc_id", edges)
      .localCheckpoint()
    phase("append_only")(DedupIndex.appendKept(spark, idx, b, verd,
      "text", "doc_id", "lang", 0.5, healRefresh = false))
    spark.stop()
  }
}
