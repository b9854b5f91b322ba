package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTest, Tables}

/** The standing chunk index must equal the one-shot chunk manifest after
  * any batch split, while recomputing only dirty chunks per batch — and a
  * replayed batch must change nothing. */
class ChunkIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  private def manifestSet(df: org.apache.spark.sql.DataFrame) =
    df.select("chunk_key", "n_docs", "n_tokens", "checksum")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("three-batch ingestion == one-shot manifest; per-batch recompute is bounded; replay is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft_chunkidx").toString + "/idx"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    // two bulk batches, then a SMALL tail batch — incrementality only
    // shows when the batch is smaller than the chunk count
    val tail = col("doc_id") >= 490
    val batches = Seq(
      docs.filter(!tail && col("doc_id") % 2 === 0),
      docs.filter(!tail && col("doc_id") % 2 === 1),
      docs.filter(tail))
    batches.zipWithIndex.foreach { case (b, i) =>
      ChunkIndex.append(spark, base, b, "text", "doc_id",
        seed = 42L, cutMod = 16L, batchId = i.toLong)
    }
    val standing = manifestSet(ChunkIndex.readManifest(spark, base))
    val oneShot = manifestSet(
      Sharding.chunkManifest(docs, "doc_id", "text", 42L, 16L))
    assert(standing == oneShot)

    // bounded recompute: the small batch's manifest delta holds only the
    // chunks its documents touched (≤ 2 per doc: landing chunk + split
    // predecessor), not the whole chunk set
    val tailDocs = docs.filter(tail).count()
    val delta2 = spark.read.parquet(s"$base/manifest")
      .filter(col("batch_id") === 2).count()
    val total = standing.size
    assert(delta2 <= 2 * tailDocs,
      s"batch 2 recomputed $delta2 chunks for $tailDocs docs")
    assert(delta2 < total,
      s"batch 2 recomputed $delta2 of $total chunks — not incremental")

    // replay batch 1 (restart between write and checkpoint commit): the
    // delta partitions are overwritten in place, the manifest unchanged
    ChunkIndex.append(spark, base, batches(1), "text", "doc_id",
      seed = 42L, cutMod = 16L, batchId = 1L)
    assert(manifestSet(ChunkIndex.readManifest(spark, base)) == oneShot,
      "replayed batch changed the standing manifest")
    // and no duplicate doc rows
    val docRows = ChunkIndex.readDocs(spark, base).count()
    assert(docRows == docs.count())
  }

  test("takedown: tombstoned docs leave the manifest equal to a rebuild without them") {
    val base = java.nio.file.Files.createTempDirectory("graft_chunkidx3").toString + "/idx"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    ChunkIndex.append(spark, base, docs, "text", "doc_id",
      seed = 42L, cutMod = 16L, batchId = 0L)
    // delete a slice that includes at least one CUT doc (forces a merge)
    val isCut = Sharding.shuffleKey(col("doc_id"), 42L) % 16L === 0L
    val victims = docs.filter(col("doc_id") % 11 === 4)
      .unionByName(docs.filter(isCut).limit(2))
      .select("doc_id").distinct()
    val nVictims = victims.count()
    assert(docs.filter(isCut).join(victims, "doc_id").count() > 0,
      "fixture slice must include a cut doc")
    ChunkIndex.delete(spark, base, victims, "doc_id", cutMod = 16L, batchId = 1L)

    val standing = manifestSet(ChunkIndex.readManifest(spark, base))
    val survivors = docs.join(victims, Seq("doc_id"), "left_anti")
    val oneShot = manifestSet(
      Sharding.chunkManifest(survivors, "doc_id", "text", 42L, 16L))
    assert(standing == oneShot, "post-delete manifest != rebuild without victims")

    // bounded work: the delete's manifest delta is sized by the victims
    val delta = spark.read.parquet(s"$base/manifest")
      .filter(col("batch_id") === 1).count()
    assert(delta <= 2 * nVictims, s"delete recomputed $delta chunks for $nVictims victims")

    // replay the delete: nothing changes
    ChunkIndex.delete(spark, base, victims, "doc_id", cutMod = 16L, batchId = 1L)
    assert(manifestSet(ChunkIndex.readManifest(spark, base)) == oneShot)
  }

  test("compaction folds deltas and tombstones; interrupted compactions heal both ways") {
    val base = java.nio.file.Files.createTempDirectory("graft_chunkidx4").toString + "/idx"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    ChunkIndex.append(spark, base, docs.filter(col("doc_id") % 2 === 0),
      "text", "doc_id", seed = 42L, cutMod = 16L, batchId = 0L)
    ChunkIndex.append(spark, base, docs.filter(col("doc_id") % 2 =!= 0),
      "text", "doc_id", seed = 42L, cutMod = 16L, batchId = 1L)
    ChunkIndex.delete(spark, base,
      docs.filter(col("doc_id") % 11 === 4).select("doc_id"),
      "doc_id", cutMod = 16L, batchId = 2L)
    val before = manifestSet(ChunkIndex.readManifest(spark, base))

    val c = ChunkIndex.compact(spark, base, cutMod = 16L)
    assert(manifestSet(ChunkIndex.readManifest(spark, base)) == before,
      "compaction changed the manifest")
    // one consolidated partition per table; tombstones folded in
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    for (t <- Seq("docs", "cuts", "manifest")) {
      val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/$t"))
        .map(_.getPath.getName).filter(_.startsWith("batch_id="))
      assert(parts.toSeq == Seq(s"batch_id=$c"), s"$t: ${parts.toSeq}")
    }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/tombs")))

    // ingestion continues above the compacted id and stays correct
    val late = Seq((90001L, "late doc alpha beta"), (90002L, "late doc gamma"))
      .toDF("doc_id", "text")
    ChunkIndex.append(spark, base, late, "text", "doc_id",
      seed = 42L, cutMod = 16L, batchId = c + 1)
    val expected = manifestSet(Sharding.chunkManifest(
      docs.filter(col("doc_id") % 11 =!= 4).unionByName(late),
      "doc_id", "text", 42L, 16L))
    assert(manifestSet(ChunkIndex.readManifest(spark, base)) == expected)

    // crash BEFORE the commit marker: partial consolidated partitions +
    // a start marker must roll back to the pre-compaction state
    val snapshot = manifestSet(ChunkIndex.readManifest(spark, base))
    val orphan = c + 50
    late.limit(1)
      .select(col("doc_id"), lit(1L).as("h"), lit(1L).as("n_tokens"),
        lit(1L).as("fp"))
      .withColumn("batch_id", lit(orphan))
      .write.mode("append").partitionBy("batch_id").parquet(s"$base/docs")
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$base/_compact_start"), true)
    out.write(orphan.toString.getBytes("UTF-8")); out.close()
    assert(manifestSet(ChunkIndex.readManifest(spark, base)) == snapshot,
      "heal did not roll back an interrupted consolidation")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/docs/batch_id=$orphan")))
  }

  test("stats report the physical layout exactly and flag drift; compaction clears it") {
    val base = java.nio.file.Files.createTempDirectory("graft_chunkidx5").toString + "/idx"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    (0 until 10).foreach { b =>
      ChunkIndex.append(spark, base, docs.filter(col("doc_id") % 10 === b),
        "text", "doc_id", seed = 42L, cutMod = 16L, batchId = b.toLong)
    }
    ChunkIndex.delete(spark, base,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"),
      "doc_id", cutMod = 16L, batchId = 10L)
    val s1 = ChunkIndex.stats(spark, base).collect().head
    assert(s1.getLong(0) == 10, "delta batch count")
    assert(s1.getLong(1) == 500, "doc rows")
    assert(s1.getLong(2) == docs.filter(col("doc_id") % 7 === 3).count(), "tombstones")
    assert(s1.getLong(3) == s1.getLong(1) - s1.getLong(2), "live docs")
    assert(s1.getBoolean(7), "ten delta batches must flag needs_compact")

    ChunkIndex.compact(spark, base, cutMod = 16L)
    val s2 = ChunkIndex.stats(spark, base).collect().head
    assert(s2.getLong(0) == 1 && s2.getLong(2) == 0 && !s2.getBoolean(7),
      s"compaction did not clear drift: $s2")
    assert(s2.getLong(3) == s1.getLong(3), "compaction changed live docs")
    assert(s2.getLong(5) == s2.getLong(6), "versions should equal chunks after compaction")
  }

  test("re-appending a deleted doc before compact() makes it live again") {
    // Regression: tombstones masked a doc_id across ALL batches, so a
    // takedown followed by re-ingest left the manifest counting the new
    // row while reads hid it. A tombstone now masks only batches at or
    // before its own, so re-ingest equals a rebuild over the live corpus.
    val base = java.nio.file.Files.createTempDirectory("graft_chunkidx6").toString + "/idx"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    ChunkIndex.append(spark, base, docs, "text", "doc_id",
      seed = 42L, cutMod = 16L, batchId = 0L)
    val victims = docs.filter(col("doc_id") % 23 === 5)
    ChunkIndex.delete(spark, base, victims.select("doc_id"),
      "doc_id", cutMod = 16L, batchId = 1L)
    // re-ingest the victims (content identical — e.g. a takedown reversed)
    ChunkIndex.append(spark, base, victims, "text", "doc_id",
      seed = 42L, cutMod = 16L, batchId = 2L)
    assert(ChunkIndex.readDocs(spark, base).count() == docs.count(),
      "re-appended docs still masked by the old tombstone")
    val standing = manifestSet(ChunkIndex.readManifest(spark, base))
    val oneShot = manifestSet(
      Sharding.chunkManifest(docs, "doc_id", "text", 42L, 16L))
    assert(standing == oneShot,
      "manifest after delete + re-append diverged from the full rebuild")
    // and the state survives compaction unchanged
    ChunkIndex.compact(spark, base, cutMod = 16L)
    assert(manifestSet(ChunkIndex.readManifest(spark, base)) == oneShot)
  }

  test("a batch introducing a new cut splits the covering chunk correctly") {
    val base = java.nio.file.Files.createTempDirectory("graft_chunkidx2").toString + "/idx"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    // batch 0: only non-cut docs; batch 1: the cut docs arrive later and
    // must split the chunks batch 0 built
    val isCut = Sharding.shuffleKey(col("doc_id"), 42L) % 16L === 0L
    ChunkIndex.append(spark, base, docs.filter(!isCut), "text", "doc_id",
      seed = 42L, cutMod = 16L, batchId = 0L)
    ChunkIndex.append(spark, base, docs.filter(isCut), "text", "doc_id",
      seed = 42L, cutMod = 16L, batchId = 1L)
    val standing = manifestSet(ChunkIndex.readManifest(spark, base))
    val oneShot = manifestSet(
      Sharding.chunkManifest(docs, "doc_id", "text", 42L, 16L))
    assert(standing == oneShot, "late-arriving cuts broke the split path")
  }
}
