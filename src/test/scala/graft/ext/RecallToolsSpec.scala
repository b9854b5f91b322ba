package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTest, Tables}

/** Units for the round-10 recall/observability additions: the
  * hot-bucket trim audit ([[Dedup.trimmedBuckets]]), the cross-engine
  * reproducible LSH bucketing ([[Similarity.lshBucketsReproducible]]),
  * and the hash-noise WAV fixture ([[Multimodal.noiseWavTable]]). */
class RecallToolsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("trimmedBuckets names exactly the buckets the pair-join cap drops") {
    // 20 ids share fingerprint 0L (every chunk collides hot); 5 cold ids
    // get fingerprints whose sixteen 16-bit chunks are all nonzero and
    // pairwise distinct, so they share no bucket with anything.
    val hot = (0L until 20L).map(i => (i, 0L))
    val coldFps = Seq(0x1111222233334444L, 0x5555666677778888L,
      0x9999AAAABBBBCCCCL, 0xDDDDEEEEFFFF0123L, 0x0123456789ABCDEFL)
    val cold = coldFps.zipWithIndex.map { case (fp, i) => (100L + i, fp) }
    val df = (hot ++ cold).toDF("id", "fp")
    val trimmed = Dedup.trimmedBuckets(df, "fp", maxBucket = 10)
      .as[(Int, Long, Long)].collect().toSet
    // the hot fingerprint occupies all 4 (band, chunk = 0) buckets, 20 each
    assert(trimmed == Set((0, 0L, 20L), (1, 0L, 20L), (2, 0L, 20L), (3, 0L, 20L)),
      s"unexpected trim rows: $trimmed")
    // with the cap the hot pairs vanish; uncapped they exist
    val capped = Dedup.hammingPairs(df, "id", "fp", maxHamming = 3, maxBucket = 10)
    val uncapped = Dedup.hammingPairs(df, "id", "fp", maxHamming = 3,
      maxBucket = Int.MaxValue)
    assert(capped.count() == 0)
    assert(uncapped.count() == 20L * 19 / 2)
  }

  test("reproducible LSH buckets nest across table counts and survive repartitioning") {
    val e = Tables(spark, dir, "embeddings")
    val b4 = Similarity.lshBucketsReproducible(e, "embedding", "vec_id",
      bits = 8, tables = 4).as[(Long, Int, Long)].collect().toSet
    val b2 = Similarity.lshBucketsReproducible(e, "embedding", "vec_id",
      bits = 8, tables = 2).as[(Long, Int, Long)].collect().toSet
    // plane (t,b,j) is independent of the table count -> strict nesting
    assert(b2 == b4.filter(_._2 < 2))
    // bucket assignment is content-only: any partitioning yields the
    // same set (the portability contract the operator exists for)
    val b4r = Similarity.lshBucketsReproducible(
      e.repartition(7, col("vec_id")), "embedding", "vec_id",
      bits = 8, tables = 4).as[(Long, Int, Long)].collect().toSet
    assert(b4r == b4)
    // and bit-matches an independent driver-side replay of the integer
    // arithmetic (quantize -> integer dot -> sign bits)
    val m = Sharding.HashMod
    def planeVal(t: Int, b: Int, j: Int): Long =
      (((t.toLong * 4096 + b.toLong * 64 + j) % m) * Sharding.HashMulA + 9L) %
        m * Sharding.HashMulB % m % 1001 - 500
    val vecs = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val replay = (for {
      (id, v) <- vecs
      t <- 0 until 4
    } yield {
      val q = v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      var bucket = 0L
      for (b <- 0 until 8) {
        val d = q.indices.map(j => q(j) * planeVal(t, b, j)).sum
        if (d >= 0) bucket |= 1L << b
      }
      (id, t, bucket)
    }).toSet
    assert(b4 == replay)
  }

  test("reproducible LSH handles dim != 64 without poisoning the dot to NULL") {
    // Regression: zip_with null-pads the shorter side; without the
    // coalesce a dim-32 vector got a NULL dot on every plane and every
    // bucket collapsed to 0 (a silent cross join), diverging from the
    // SQL replay's NULL-skipping sum.
    val vecs = Seq(
      (1L, (0 until 32).map(i => (i - 16) / 16.0f)),
      (2L, (0 until 32).map(i => ((i * 7) % 13 - 6) / 6.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.lshBucketsReproducible(df, "embedding", "vec_id",
      bits = 8, tables = 2).as[(Long, Int, Long)].collect().toSet
    val m = Sharding.HashMod
    def planeVal(t: Int, b: Int, j: Int): Long =
      (((t.toLong * 4096 + b.toLong * 64 + j) % m) * Sharding.HashMulA + 9L) %
        m * Sharding.HashMulB % m % 1001 - 500
    val replay = (for { (id, v) <- vecs; t <- 0 until 2 } yield {
      val q = v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      var bucket = 0L
      for (b <- 0 until 8) {
        val d = q.indices.map(j => q(j) * planeVal(t, b, j)).sum
        if (d >= 0) bucket |= 1L << b
      }
      (id, t, bucket)
    }).toSet
    assert(got == replay)
    // and the two vectors must not trivially share every bucket
    assert(got.groupBy(_._2).exists(_._2.map(_._3).size == 2))
  }

  test("noiseWavTable payloads decode to the closed-form hash samples") {
    val docs = Seq(0L, 1L, 7L, 399L, 400L).toDF("doc_id")
    val media = Multimodal.noiseWavTable(docs)
      .as[(Long, Array[Byte])].collect().toMap
    val m = Sharding.HashMod
    for (id <- Seq(0L, 1L, 7L, 399L, 400L)) {
      val wav = Codecs.decodeWav(media(id))
      assert(wav.sampleRate == 8000)
      val n = (200 + id % 400).toInt
      assert(wav.samples.length == n, s"doc $id length")
      val expected = Array.tabulate(n) { i =>
        val k = id * 1024 + i
        val h2 = ((k % m) * Sharding.HashMulA + 7L) % m * Sharding.HashMulB % m
        (((h2 ^ (h2 >> 13)) % 4001) - 2000).toInt
      }
      assert(wav.samples.sameElements(expected), s"doc $id samples")
    }
  }
}
