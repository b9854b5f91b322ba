package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTest, Tables}

class PerceptronSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("separable corpus: training converges to zero errors") {
    val docs = Seq(
      (1L, "spam offer spam deal"), (2L, "spam spam prize"),
      (3L, "meeting notes agenda"), (4L, "quarterly report numbers"),
      (5L, "offer spam click"), (6L, "agenda notes meeting report"))
      .toDF("doc_id", "text")
    val w = Perceptron.train(docs, "text", "doc_id",
      "text LIKE '%spam%'", iters = 5)
    val pred = Perceptron.predict(docs, "text", "doc_id",
      "text LIKE '%spam%'", w)
    val rows = pred.select("doc_id", "correct").as[(Long, Boolean)].collect()
    assert(rows.length == 6 && rows.forall(_._2),
      s"not converged: ${rows.filterNot(_._2).mkString(",")}")
  }

  test("multiclass: separable 3-class corpus routes every doc to its class") {
    // tokens chosen to land in DISTINCT hash buckets mod 64 (double-letter
    // tokens all collapse to buckets {0, 32} — c·32 mod 64 — and made the
    // classes inseparable in feature space)
    val docs = Seq(
      (1L, "alpha", "ax ax ay"), (2L, "alpha", "ax ay ay"),
      (3L, "beta", "bx bx by"), (4L, "beta", "bx by"),
      (5L, "gamma", "cx cy cx"), (6L, "gamma", "cx cy cy"))
      .toDF("doc_id", "lang", "text")
    val w = Perceptron.trainMulticlass(docs, "text", "doc_id", "lang", iters = 5)
    val conf = Perceptron.confusion(docs, "text", "doc_id", "lang", w)
      .as[(String, String, Long)].collect().toSet
    assert(conf == Set(("alpha", "alpha", 2L), ("beta", "beta", 2L),
      ("gamma", "gamma", 2L)), s"confusion: $conf")
  }

  test("learned weights are partition-count invariant (bit-exact training)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    def weightsAt(p: Int) = {
      val prev = spark.sessionState.conf.numShufflePartitions
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try Perceptron.train(docs, "text", "doc_id", "lang = 'en'", iters = 3)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = weightsAt(2)
    val b = weightsAt(16)
    assert(a == b, "training result depended on partitioning")
    assert(a.exists(_._2 != 0L), "training learned nothing")
  }
}
