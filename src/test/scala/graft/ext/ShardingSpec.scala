package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTest, Tables}

/** Epoch-shuffle invariants. The load-bearing claim is that the two-phase
  * prefix sum (per-partition totals → broadcast offsets → streaming add) is
  * EXACTLY the global window formulation regardless of how the range
  * exchange happened to split boundaries — that's what makes the operator
  * safe to run at any cluster size with a reproducible result. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  private def run(parts: Int): Seq[(Long, Long, Long, Long, Long, Int)] = {
    val prev = spark.sessionState.conf.numShufflePartitions
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try Sharding.epochShuffle(
        Tables(spark, dir, "documents"), "doc_id", "text",
        seed = 7L, budget = 2000L)
      .select("doc_id", "h", "n_tokens", "cum_before", "shard", "pos")
      .as[(Long, Long, Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("prefix sum is partition-count invariant and matches the window twin") {
    val r1 = run(1) // single partition ⇒ trivially the sequential prefix sum
    val r8 = run(8)
    assert(r1 == r8, "two-phase prefix sum must not depend on boundaries")

    // cum_before really is the prefix sum in (h, id) order
    val inOrder = r8.sortBy(r => (r._2, r._1))
    var cum = 0L
    inOrder.foreach { case (_, _, tok, before, shard, _) =>
      assert(before == cum)
      assert(shard == before / 2000L)
      cum += tok
    }
  }

  test("same seed reproduces; different seed permutes") {
    assert(run(4) == run(4))
    val a = Sharding.epochShuffle(Tables(spark, dir, "documents"),
      "doc_id", "text", seed = 7L, budget = 2000L)
      .select("doc_id", "pos").as[(Long, Int)].collect().toMap
    val b = Sharding.epochShuffle(Tables(spark, dir, "documents"),
      "doc_id", "text", seed = 8L, budget = 2000L)
      .select("doc_id", "pos").as[(Long, Int)].collect().toMap
    assert(a.keySet == b.keySet)
    assert(a != b, "a new seed must yield a different epoch order")
  }

  test("cumulative sums survive a downstream coalesce(1)") {
    // Same hazard class as RanksSpec's coalesce regression. Today the
    // trailing pos-window's exchange happens to shield the offset-add pass
    // from the sink's narrow fold, but the invariant must not depend on
    // that plan accident — the split-index binding keeps it true even if
    // the window is later optimized away or reordered.
    val r = Sharding.epochShuffle(Tables(spark, dir, "documents"),
        "doc_id", "text", seed = 7L, budget = 2000L)
      .coalesce(1)
      .select("h", "n_tokens", "cum_before")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    var cum = 0L
    r.foreach { case (_, tok, before) =>
      assert(before == cum, "running total restarted under coalesce(1)")
      cum += tok
    }
  }

  test("writeShards lays out one pruned, epoch-ordered file per shard with a matching manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val docs = Tables(spark, dir, "documents")
    Sharding.writeShards(docs, "doc_id", "text", seed = 7L, budget = 2000L, s"$out/ep0")

    // layout: shard=K dirs, exactly one data file each (a shard IS a file)
    val dirs = new java.io.File(s"$out/ep0").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: expected one file, got ${files.length}")
    }

    // within-file order IS epoch order: pos strictly increasing as stored
    val shard0 = Sharding.readShard(spark, s"$out/ep0", 0L)
    val posInOrder = shard0.select("pos").as[Int].collect().toSeq
    assert(posInOrder == posInOrder.sorted, "rows not stored in epoch order")
    assert(posInOrder.nonEmpty && posInOrder.head == 1)

    // partition pruning reaches the scan
    val plan = shard0.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"))

    // manifest matches a recomputation from the stored corpus
    val manifest = Sharding.readManifest(spark, s"$out/ep0")
      .orderBy("shard")
      .select("shard", "n_docs", "n_tokens", "start_tok", "end_tok", "checksum")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val recomputed = spark.read.parquet(s"$out/ep0")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("cum_before").as("start_tok"),
        max(expr("cum_before + n_tokens")).as("end_tok"),
        sum(expr(s"(doc_id * pos) % ${Sharding.HashMod}")).as("checksum"))
      .orderBy("shard")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(manifest == recomputed)
    // intervals tile the token stream: next shard starts where this ends
    manifest.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 == b._4, s"gap between shards ${a._1} and ${b._1}")
      case _ =>
    }
  }

  test("assignChunkKeysBy2 equals two independent single-flag runs on " +
       "adversarial flag mixes (all-cut, no-cut, sparse, first/last rows)") {
    import org.apache.spark.sql.DataFrame
    def frame(rows: Seq[(Long, Long, Long, Long, Long)]): DataFrame =
      rows.toDF("id", "n_tokens", "h", "is_cut_a", "is_cut_b")
    def single(df: DataFrame, flag: String) =
      Sharding.assignChunkKeysBy(df.select(col("id"), col("n_tokens"),
          col("h"), col(flag).as("is_cut")))
        .select("id", "chunk_key").as[(Long, Long)].collect().toMap
    def fused(df: DataFrame) =
      Sharding.assignChunkKeysBy2(df)
        .select("id", "key_a", "key_b").as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    // deterministic pseudo-random mixes, including the degenerate ones
    val cases = Seq[Seq[(Long, Long, Long, Long, Long)]](
      (0L until 500L).map(i =>
        (i, i % 7 + 1, i * 2654435761L % 100003L,
          if (i % 11 == 0) 1L else 0L, if (i % 5 == 0) 1L else 0L)),
      (0L until 100L).map(i => (i, 1L, i * 37L, 1L, 0L)),   // a all-cut
      (0L until 100L).map(i => (i, 1L, i * 37L, 0L, 0L)),   // both cutless
      Seq((1L, 1L, 5L, 1L, 1L), (2L, 1L, 9L, 0L, 1L)))      // tiny
    cases.foreach { rows =>
      val df = frame(rows)
      val (a, b) = (single(df, "is_cut_a"), single(df, "is_cut_b"))
      val f = fused(df)
      assert(f.keySet == a.keySet)
      f.foreach { case (id, (ka, kb)) =>
        assert(ka == a(id), s"id=$id key_a: fused $ka vs single ${a(id)}")
        assert(kb == b(id), s"id=$id key_b: fused $kb vs single ${b(id)}")
      }
    }
  }

  test("shards hold contiguous token ranges bounded by budget + one doc") {
    val r = run(4)
    val maxDoc = r.map(_._3).max
    r.groupBy(_._5).foreach { case (_, rows) =>
      val tokens = rows.map(_._3).sum
      // every shard except possibly the last is filled past its start
      assert(tokens <= 2000L + maxDoc,
        s"shard overfilled: $tokens tokens vs budget 2000 + maxDoc $maxDoc")
    }
    // shard ids are dense from 0
    val ids = r.map(_._5).distinct.sorted
    assert(ids == (0L until ids.length).toSeq)
  }
}
