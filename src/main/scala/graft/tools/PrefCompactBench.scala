package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.PreferenceIndex

/** Controlled experiment: full [[PreferenceIndex.compact]] vs the
  * history-preserving partial retirement [[PreferenceIndex
  * .compactBatched]] on identical standing preference indexes — the
  * preference twin of [[CompactBench]]/[[AnnCompactBench]], closing the
  * drift-probe family's missing full-vs-partial artifact.
  *
  * Both strategies physically retire the pending tombstones; they differ
  * in what else they do, and the artifact must say so: `compact` folds
  * every window's deltas into ONE consolidated batch (correct for
  * leaderboard serving, destroys the batch ≡ window correspondence the
  * drift fits read), while `compactBatched` preserves per-batch history
  * and rewrites ONLY the delta partitions physically holding a withdrawn
  * item's rows. The workload models why that locality exists: items have
  * WINDOWED LIFETIMES (live in `span`+1 consecutive windows of `W`), so
  * a fixed-count takedown's judgments cluster in few windows and most
  * partitions stay clean — the request-driven sparse-takedown model the
  * other two experiments use.
  *
  * Deterministic synthetic feed (no RNG: multiplicative hashes of the
  * row id), scaled by `nJudgments` — the preference stack's costs are
  * judgment-volume-shaped, not fixture-shaped, so the corpus tables are
  * not involved.
  *
  * Usage: runMain graft.tools.PrefCompactBench [nJudgments] [K] [W] [nWithdraw]
  * Emits one JSON line with the timings, the dirty/total window counts,
  * and the ratio. */
object PrefCompactBench {

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val k = if (args.length > 1) args(1).toInt else 200
    val w = if (args.length > 2) args(2).toInt else 40
    val nWithdraw = if (args.length > 3) args(3).toInt else 3
    val span = 4
    val spark = SparkSession.builder()
      .appName("graft-pref-compact-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val perW = math.max(n / w, 1L)
    // window w's live items are the contiguous id range
    // [lo(w), lo(w) + width): judgments cluster in an item's lifetime
    val width = math.max(k * (span + 1) / w, 2)
    def scratch(tag: String): String = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_prefcb_$tag").toString
      s"$d/pref"
    }
    // All windows generated analytically in ONE frame and written with
    // ONE partitioned write per table — byte-equivalent state to W
    // sequential appendJudgments calls (each of which aggregates its
    // window to (winner, loser, n) / (a, b, n) and lands one
    // batch_id=<w> partition), but the fixture build stops costing 2·W
    // sequential write rounds per index. The timed section below runs
    // the REAL production APIs.
    def build(base: String): Unit = {
      val j0 = spark.range(n)
        .select((col("id") / perW).cast("long").as("batch_id"), col("id"))
      // floor + cast: SQL `/` on longs yields DOUBLE, and a double item
      // id would stringify as "17.0" — never matching a takedown's "17"
      val lo = greatest(lit(0L),
        floor((col("batch_id") - lit(span.toLong)) * k / lit(w))
          .cast("long"))
      val hi = least(lit((k - 1).toLong), lo + width)
      val j = j0.select(col("batch_id"),
          (lo + pmod(hash(col("id"), lit(1)), (hi - lo).cast("int")))
            .cast("string").as("ia"),
          (lo + pmod(hash(col("id"), lit(2)), (hi - lo).cast("int")))
            .cast("string").as("ib"),
          when(pmod(hash(col("id"), lit(3)), lit(10)) < 4, "a")
            .when(pmod(hash(col("id"), lit(3)), lit(10)) < 8, "b")
            .otherwise("tie").as("oc"))
        .filter(col("ia") =!= col("ib"))
        .localCheckpoint()
      try {
        j.filter(col("oc") =!= "tie")
          .select(col("batch_id"),
            when(col("oc") === "a", col("ia")).otherwise(col("ib"))
              .as("winner"),
            when(col("oc") === "a", col("ib")).otherwise(col("ia"))
              .as("loser"))
          .groupBy("batch_id", "winner", "loser").agg(count(lit(1)).as("n"))
          .write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$base/edges")
        j.filter(col("oc") === "tie")
          .select(col("batch_id"), least(col("ia"), col("ib")).as("a"),
            greatest(col("ia"), col("ib")).as("b"))
          .groupBy("batch_id", "a", "b").agg(count(lit(1)).as("n"))
          .write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$base/ties")
      } finally graft.exec.Partitioning.unpersistCheckpoint(j)
      // withdraw the first items — their judgments live in the first
      // ~span+1 windows only (the clustering the partial path exploits)
      PreferenceIndex.withdraw(spark, base,
        spark.range(nWithdraw).select(col("id").as("item")), "item",
        batchId = 1000L)
    }
    val bFull = scratch("full"); val bPart = scratch("part")
    build(bFull); build(bPart)
    // dirty windows under this takedown (discovery only, pre-timing)
    val tombs = spark.range(nWithdraw)
      .select(col("id").cast("string").as("item"))
    val edges = spark.read.parquet(s"$bPart/edges")
    val dirty = Seq("winner", "loser").map(c =>
        edges.join(broadcast(tombs.select(col("item").as(c))), Seq(c),
          "left_semi"))
      .reduce(_.unionAll(_)).select("batch_id").distinct().count()
    val fullSec = time(PreferenceIndex.compact(spark, bFull))
    val partSec = time(PreferenceIndex.compactBatched(spark, bPart))
    // both retired the tombstones; the partial path preserved history
    require(!new java.io.File(s"$bPart/tombs").exists, "tombs must clear")
    val winsLeft = spark.read.parquet(s"$bPart/edges")
      .select("batch_id").distinct().count()
    println(f"""{"n_judgments":$n,"k":$k,"windows":$w,""" +
      f""""n_withdraw":$nWithdraw,"dirty_windows":$dirty,""" +
      f""""windows_after_partial":$winsLeft,""" +
      f""""full_sec":$fullSec%.3f,"partial_sec":$partSec%.3f,""" +
      f""""ratio":${fullSec / partSec}%.2f}""")
    spark.stop()
  }
}
