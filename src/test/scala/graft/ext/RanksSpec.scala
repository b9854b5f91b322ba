package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTest, Tables}
import graft.exec.Ranks

/** The two-phase row_number must be bit-identical to the window
  * formulation at every partition count — that equality is what lets the
  * DuckDB window oracles certify the distributed plan. */
class RanksSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  private def withParts[A](n: Int)(f: => A): A = {
    val prev = spark.sessionState.conf.numShufflePartitions
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("globalRowNumber equals the global window at 1, 3 and 16 partitions") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("len"))
    val expected = docs
      .withColumn("rn", row_number().over(Window.orderBy(col("len"), col("doc_id"))).cast("long"))
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    for (p <- Seq(1, 3, 16)) {
      val got = withParts(p) {
        Ranks.globalRowNumber(docs, Seq(col("len"), col("doc_id")))
          .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
      }
      assert(got == expected, s"mismatch at $p partitions")
    }
  }

  test("groupedRowNumber equals the partitioned window, including one-row and null groups") {
    val df = Seq(
      (1L, Some("en"), 10), (2L, Some("en"), 5), (3L, Some("zh"), 7),
      (4L, None, 9), (5L, None, 1), (6L, Some("de"), 2),
      (7L, Some("en"), 5) // tie on the first order key → doc_id breaks it
    ).toDF("id", "lang", "v")
    val expected = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("v"), col("id"))).cast("long"))
      .as[(Long, Option[String], Int, Long)].collect().sortBy(_._1).toSeq
    for (p <- Seq(1, 4)) {
      val got = withParts(p) {
        Ranks.groupedRowNumber(df, Seq("lang"), Seq(col("v"), col("id")), "rn")
          .as[(Long, Option[String], Int, Long)].collect().sortBy(_._1).toSeq
      }
      assert(got == expected, s"mismatch at $p partitions")
    }
  }

  test("groupedPrefixSum equals the exclusive window sum at any partition count") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("v"))
    val expected = docs.withColumn("c",
        coalesce(sum(col("v")).over(
          Window.partitionBy("lang").orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "c").as[(Long, Long)].collect().toMap
    for (p <- Seq(1, 8)) {
      val got = withParts(p) {
        Ranks.groupedPrefixSum(docs, Seq("lang"), Seq(col("doc_id")), "v", "c")
          .select("doc_id", "c").as[(Long, Long)].collect().toMap
      }
      assert(got == expected, s"prefix sums diverged at $p partitions")
    }
  }

  test("prefix sum accepts an Int value column with nulls (nulls count as zero)") {
    // Regression: valueOf used r.getLong on the raw column, so an
    // IntegerType value threw ClassCastException and a null NPE'd. The
    // public contract is now any numeric, nulls as zero.
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 13 === 0, lit(null))
          .otherwise((col("doc_id") % 10).cast("int")).as("v"))
    val expected = docs
      .withColumn("c", coalesce(
        sum(coalesce(col("v"), lit(0))).over(
          Window.partitionBy("lang").orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "c").as[(Long, Long)].collect().toMap
    val got = withParts(8) {
      Ranks.groupedPrefixSum(docs, Seq("lang"), Seq(col("doc_id")), "v", "c")
        .select("doc_id", "c").as[(Long, Long)].collect().toMap
    }
    assert(got == expected)
    // the internal normalized column must not leak into the output
    val cols = Ranks.groupedPrefixSum(docs, Seq("lang"), Seq(col("doc_id")),
      "v", "c").columns.toSeq
    assert(cols == Seq("doc_id", "lang", "v", "c"), cols.toString)
  }

  test("a non-numeric value column fails loudly, not with a cast error mid-job") {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("lang"))
    val e = intercept[IllegalArgumentException] {
      Ranks.groupedPrefixSum(docs, Nil, Seq(col("doc_id")), "lang", "c")
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("ranks survive a downstream coalesce(1) — the sink shape that folds partitions") {
    // Regression: a narrow re-partitioning after the numbering pass (any
    // single-file sink does coalesce(1)) folds the checkpoint partitions
    // into one task. With TaskContext-based partition identity every folded
    // chunk read offset 0 and ranks restarted mid-corpus; the split-index
    // binding must keep them dense.
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
    val pos = withParts(8) {
      Ranks.globalRowNumber(docs, Seq(col("doc_id")), "pos")
        .coalesce(1)
        .select("pos").as[Long].collect().sorted.toSeq
    }
    assert(pos == (1L to pos.length).toSeq, s"ranks restarted: ${pos.take(10)}")
    val grouped = withParts(8) {
      Ranks.groupedRowNumber(docs, Seq("lang"), Seq(col("doc_id")), "rn")
        .coalesce(1)
        .groupBy("lang").agg(count(lit(1)).as("n"), max("rn").as("mx"), sum("rn").as("s"))
        .as[(String, Long, Long, Long)].collect()
    }
    grouped.foreach { case (lang, n, mx, s) =>
      assert(mx == n && s == n * (n + 1) / 2, s"$lang grouped ranks broken under coalesce")
    }
  }

  test("grouped ranks are dense 1..n per group on fixture languages") {
    val docs = Tables(spark, dir, "documents")
    val r = withParts(8) {
      Ranks.groupedRowNumber(docs.select(col("doc_id"), col("lang")),
        Seq("lang"), Seq(col("doc_id")), "rn")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), max("rn").as("mx"),
          sum("rn").as("s"))
        .as[(String, Long, Long, Long)].collect()
    }
    assert(r.nonEmpty)
    r.foreach { case (lang, n, mx, s) =>
      assert(mx == n, s"$lang: max rank $mx != count $n")
      assert(s == n * (n + 1) / 2, s"$lang: ranks not dense")
    }
  }

  test("a caller column named like the internal value column is preserved") {
    // Regression (r9 advice): withColumn on a colliding name REPLACES in
    // place instead of appending, and the internal-column strip then
    // removed the caller's trailing column and corrupted rows. The
    // internal name must dodge caller columns.
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("__graft_tp_value"),
        lit(1L).as("__graft_tp_value0"))
    val out = withParts(4) {
      Ranks.groupedPrefixSum(docs, Seq("lang"), Seq(col("doc_id")),
        "__graft_tp_value", "cum")
    }
    assert(out.columns.toSeq ==
      Seq("doc_id", "lang", "__graft_tp_value", "__graft_tp_value0", "cum"),
      s"caller columns lost: ${out.columns.toSeq}")
    val expected = docs
      .withColumn("cum", coalesce(sum(col("__graft_tp_value"))
        .over(Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = out.as[(Long, String, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == expected)
  }
}
