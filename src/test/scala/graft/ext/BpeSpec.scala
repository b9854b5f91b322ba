package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** BPE trainer semantics on hand-checkable corpora, plus distributed ==
  * sequential-reference equality on a fixture slice. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("mergePair is greedy left-to-right and non-overlapping") {
    assert(Bpe.mergePair("aaa".map(_.toString), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergePair("aaaa".map(_.toString), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.mergePair(IndexedSeq("ab", "c", "ab"), "ab", "c") == Seq("abc", "ab"))
    assert(Bpe.mergePair(IndexedSeq("x"), "a", "b") == Seq("x"))
  }

  test("learned merges on a tiny corpus match hand computation") {
    // "low low lower": pairs lo×3, ow×3, we×1, er×1 → tie lo/ow breaks
    // to 'lo' (left asc); then (lo,w)×3 → 'low'; then the n=1 tie between
    // (e,r) and (low,e) breaks to (e,r) — 'e' < 'low' lexicographically.
    val docs = Seq("low low lower").toDF("text")
    val m = Bpe.merges(docs, "text", k = 3)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(m == Seq((1, "l", "o", 3L), (2, "lo", "w", 3L), (3, "e", "r", 1L)))
  }

  test("encodedLen equals the imperative merge fold, incl. overlap runs") {
    import org.apache.spark.sql.functions.col
    val merges = Seq(("a", "a"), ("l", "o"), ("lo", "w"))
    val words = Seq("aaa", "aaaa", "low", "lower", "x", "ab").toDF("w")
    val got = words.select(col("w"), Bpe.encodedLen(col("w"), merges).as("n"))
      .as[(String, Long)].collect().toMap
    val want = words.as[String].collect().map { w =>
      w -> merges.foldLeft(w.map(_.toString).toIndexedSeq: IndexedSeq[String]) {
        case (s, (l, r)) => Bpe.mergePair(s, l, r)
      }.length.toLong
    }.toMap
    assert(got == want)
    assert(got("aaa") == 2L && got("aaaa") == 2L && got("low") == 1L)
  }

  test("distributed merges equal the sequential reference on fixture docs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val dist = Bpe.merges(docs, "text", k = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val words = Bpe.wordCounts(docs, "text").as[(String, Long)].collect().toMap
    val ref = Bpe.referenceMerges(words, k = 8)
    assert(dist == ref)
    assert(dist.length == 8)
    // counts must be non-increasing only within equal merge contexts — not
    // guaranteed globally (a merge can create a new frequent pair), but
    // every count is positive and pairs are distinct
    assert(dist.forall(_._4 > 0))
    assert(dist.map(m => (m._2, m._3)).distinct.length == dist.length)
  }
}
