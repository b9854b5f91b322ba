package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.DedupIndex

/** Controlled experiment: full [[DedupIndex.compact]] vs
  * [[DedupIndex.compactPartial]] on the SAME index state — a
  * realistic standing corpus with append pressure and a FIXED-COUNT
  * sparse takedown (takedowns are request-driven; they do not scale
  * with the corpus). Two identical indexes are built (bulk write +
  * one appended batch + K tombstones), then each is folded by one
  * strategy under a timer. The interesting number is the RATIO and
  * how it moves with sf: the full fold rewrites the corpus (linear),
  * the partial fold rewrites only the tombstone-dirty exact/sh
  * buckets and hard-links everything else (bounded by the takedown,
  * not the corpus).
  *
  * `buckets` is the locality dial: the rewrite unit is the file, and a
  * bulk file is corpus/buckets — at 32 buckets a sparse takedown still
  * touches a third of the corpus, at production granularity (hundreds+
  * of buckets / bounded file sizes) it touches only its own files.
  *
  * Usage: runMain graft.tools.CompactBench <sfDir> [nDeletes] [buckets]
  * Emits one JSON line: {"sf":…,"n_docs":…,"n_deletes":…,"buckets":…,
  *   "full_sec":…,"partial_sec":…,"ratio":…} */
object CompactBench {

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nDeletes = if (args.length > 1) args(1).toInt else 12
    val buckets = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .appName("graft-compact-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).localCheckpoint()
    val delta = docs.filter(col("doc_id") % 5 === 0).localCheckpoint()
    val nDocs = corpus.count()
    val tomb = corpus.select("doc_id").orderBy("doc_id")
      .limit(nDeletes).localCheckpoint()
    def build(base: String): Unit = {
      DedupIndex.write(corpus, "text", "doc_id", "lang", base,
        threshold = 0.5, buckets = buckets)
      // fold the build's parallel-write fragmentation ONCE so the timed
      // comparison runs on the steady-state layout (a standing index
      // compacts after bulk load; appends land one file per bucket)
      DedupIndex.compact(spark, base)
      DedupIndex.appendKept(spark, base, delta,
        delta.select(col("doc_id"), lit(true).as("keep"),
          lit(null).cast("string").as("reason")),
        "text", "doc_id", "lang", threshold = 0.5, batchId = 3L)
      DedupIndex.delete(spark, base, tomb, "doc_id")
    }
    build("t_cbench_full"); build("t_cbench_part")
    val fullSec = time(DedupIndex.compact(spark, "t_cbench_full"))
    val partSec = time(DedupIndex.compactPartial(spark, "t_cbench_part"))
    println(f"""{"sf":"$sfDir","n_docs":$nDocs,"n_deletes":$nDeletes,""" +
      f""""buckets":$buckets,""" +
      f""""full_sec":$fullSec%.3f,"partial_sec":$partSec%.3f,""" +
      f""""ratio":${fullSec / partSec}%.2f}""")
    spark.stop()
  }
}
