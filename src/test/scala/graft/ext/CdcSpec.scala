package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTest, Tables}
import graft.queries.TrainPrepQueries

/** The property that justifies content-defined chunking: a corpus delta
  * invalidates ONLY the chunks containing touched documents (plus the
  * chunk merge when a cut document vanishes) — unlike the ordinal epoch
  * shards, where one delete shifts every later shard. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("chunk keys partition the corpus and are stable identities") {
    val chunks = Sharding.contentChunks(Tables(spark, dir, "documents"),
      "doc_id", "text", seed = 42L, cutMod = 16L)
    val n = chunks.count()
    assert(n == 500)
    // every doc has exactly one chunk; each non-prefix chunk's key is the
    // hash of one of its own member cut docs
    val bad = chunks.filter(col("chunk_key") =!= -1L)
      .groupBy("chunk_key")
      .agg(max(when(col("h") === col("chunk_key"), 1L).otherwise(0L)).as("has_cut"))
      .filter(col("has_cut") === 0L).count()
    assert(bad == 0L, "a chunk key that is not its own cut doc's hash")
  }

  test("a sparse corpus delta touches a bounded set of chunks; the rest are byte-identical") {
    // Sparse delta: edit 5 docs, drop 2 (the q_cdc_diff fixture delta is
    // intentionally DENSE — ~10% of docs — to exercise every status under
    // the oracle; locality only shows with a delta smaller than a chunk)
    val docs = Tables(spark, dir, "documents")
    val b = docs.filter(col("doc_id") % 250 =!= 5)
      .withColumn("text",
        when(col("doc_id") % 100 === 3, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    val touchedDocs = docs
      .filter(col("doc_id") % 250 === 5 || col("doc_id") % 100 === 3).count()
    def m(d: org.apache.spark.sql.DataFrame) =
      Sharding.chunkManifest(d, "doc_id", "text", 42L, 16L)
        .as[(Long, Long, Long, Long)].collect()
        .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    val (ma, mb) = (m(docs), m(b))
    val keys = ma.keySet ++ mb.keySet
    val notSame = keys.count(k => ma.get(k) != mb.get(k))
    assert(keys.size > 10, s"too few chunks (${keys.size}) for the property to bite")
    // each touched doc can invalidate at most its own chunk, plus one
    // merge when a deleted doc was a chunk's cut
    assert(notSame <= 2 * touchedDocs,
      s"$notSame chunks differ for $touchedDocs touched docs")
    assert(notSame < keys.size / 2,
      s"locality lost: $notSame of ${keys.size} chunks differ")
    assert(notSame > 0)
  }

  test("ordinal epoch shards cascade where CDC chunks do not") {
    val docs = Tables(spark, dir, "documents")
    val b = docs.filter(col("doc_id") =!= 7L) // drop ONE document
    def manifest(d: org.apache.spark.sql.DataFrame) =
      Sharding.epochShuffle(d, "doc_id", "text", 42L, 2000L)
        .groupBy("shard").agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
        .as[(Long, Long, Long)].collect().toSet
    val cascade = manifest(docs).diff(manifest(b)).size
    def cdc(d: org.apache.spark.sql.DataFrame) =
      Sharding.chunkManifest(d, "doc_id", "text", 42L, 16L)
        .as[(Long, Long, Long, Long)].collect().toSet
    val local = cdc(docs).diff(cdc(b)).size
    assert(local <= 1, s"CDC blast radius was $local chunks for one delete")
    assert(cascade >= local,
      s"expected ordinal shards ($cascade) to invalidate at least as many units as CDC ($local)")
  }
}
