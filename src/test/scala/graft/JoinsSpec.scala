package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: backward match, equal-ts match, no-match null, tolerance") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:00:00"), 200.0)).toDF("k", "ts", "px")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:59:00"), 99.5),
      (1L, ts("2024-01-01 10:05:00"), 100.5), // equal ts: must match
      (3L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "bid")

    val r = Joins.asOf(trades, quotes, Seq("k"), "ts", "ts")
      .orderBy("k", "ts")
      .select("k", "px", "r_bid").as[(Long, Double, Option[Double])].collect()
    assert(r.toSeq == Seq(
      (1L, 100.0, Some(99.5)),
      (1L, 101.0, Some(100.5)),
      (2L, 200.0, None)))

    val tol = Joins.asOf(trades, quotes, Seq("k"), "ts", "ts",
        tolerance = Some("2 minutes"))
      .orderBy("k", "ts")
      .select("k", "r_bid").as[(Long, Option[Double])].collect()
    // first trade is 1 min after its quote (within), second exactly at its
    // quote (within), key 2 unmatched
    assert(tol.toSeq == Seq((1L, Some(99.5)), (1L, Some(100.5)), (2L, None)))
  }

  test("asOf forward/nearest == brute-force reference on random data") {
    val rnd = new scala.util.Random(7)
    def t(m: Int) = ts(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val lefts = (0 until 60).map(i => (rnd.nextInt(3).toLong, t(rnd.nextInt(120)), i.toLong))
    val rights = (0 until 40).map(i => (rnd.nextInt(4).toLong, t(rnd.nextInt(120)), i * 1.0))
    val l = lefts.toDF("k", "ts", "lid")
    val r = rights.toDF("k", "ts", "rv")
    def brute(dir: String): Map[Long, Option[Double]] =
      lefts.map { case (k, lts, lid) =>
        val cands = rights.filter(_._1 == k)
        val picked = dir match {
          case "backward" =>
            cands.filter(!_._2.after(lts)).sortBy(c => (-c._2.getTime, c._3)).headOption
          case "forward" =>
            cands.filter(!_._2.before(lts)).sortBy(c => (c._2.getTime, c._3)).headOption
          case "nearest" =>
            // min |dt|; ties backward; among equals pick deterministic min rv
            cands.sortBy(c => (math.abs(c._2.getTime - lts.getTime),
              if (c._2.after(lts)) 1 else 0, c._3)).headOption
        }
        lid -> picked.map(_._3)
      }.toMap
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = Joins.asOf(l, r, Seq("k"), "ts", "ts", direction = dir)
        .select("lid", "r_rv").as[(Long, Option[Double])].collect().toMap
      val want = brute(dir)
      // ties among same-ts right rows: any same-ts candidate is acceptable;
      // compare on the matched TIMESTAMP+presence level for exactness
      lefts.foreach { case (k, lts, lid) =>
        (got(lid), want(lid)) match {
          case (None, None) => ()
          case (Some(g), Some(w)) =>
            val gts = rights.find(x => x._1 == k && x._3 == g).get._2.getTime
            val wts = rights.find(x => x._1 == k && x._3 == w).get._2.getTime
            assert(gts == wts, s"$dir lid=$lid matched ts $gts vs $wts")
          case (g, w) => fail(s"$dir lid=$lid: got $g want $w")
        }
      }
    }
  }

  test("salted two-phase aggregation == plain groupBy") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val got = graft.exec.Skew.saltedAgg(li, Seq("l_returnflag"), salts = 8,
        partial = Seq(
          sum(col("l_quantity").cast("decimal(27,7)")).as("p_qty"),
          count(lit(1)).as("p_n")),
        combine = Seq(
          sum(col("p_qty")).cast("double").as("qty"),
          sum(col("p_n")).as("n")))
      .as[(String, Double, Long)].collect().toSet
    val want = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(27,7)")).cast("double").as("qty"),
        count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(got == want)
  }

  test("salted join == plain join, inner and left") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity")
    // 3-value key: exactly the hot-key shape saltedJoin targets
    val dim = Seq(("A", "flagA"), ("N", "flagN"), ("X", "flagX"))
      .toDF("l_returnflag", "label")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_returnflag", "label")
        .as[(Long, String, String)].collect().sorted.toSeq
    val gotInner = canon(graft.exec.Skew.saltedJoin(li, dim, Seq("l_returnflag"), salts = 8))
    val wantInner = canon(li.join(dim, Seq("l_returnflag")))
    assert(gotInner == wantInner && gotInner.nonEmpty)
    val gotLeft = graft.exec.Skew.saltedJoin(li, dim, Seq("l_returnflag"),
        salts = 8, joinType = "left")
      .select("l_orderkey", "l_returnflag", "label")
      .as[(Long, String, Option[String])].collect().sorted.toSeq
    val wantLeft = li.join(dim, Seq("l_returnflag"), "left")
      .select("l_orderkey", "l_returnflag", "label")
      .as[(Long, String, Option[String])].collect().sorted.toSeq
    assert(gotLeft == wantLeft)
  }

  test("bloom-prefiltered semi join == plain semi join; SQL surface resolves") {
    val big = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val dim = Tables(spark, "/root/testdata/sf0.001", "part")
      .where(col("p_size") <= 5).select(col("p_partkey"))
    val got = Joins.bloomSemiJoin(big, "l_partkey", dim, "p_partkey",
        estimatedItems = 1000L, numBits = 65536L)
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .as[(Long, Int, Long)].collect().toSet
    val want = big.join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
    // the sketch itself through the registered SQL functions: lossless
    // prefilter — every true key passes
    graft.GraftExtensions.register(spark)
    dim.createOrReplaceTempView("bloom_dim")
    big.createOrReplaceTempView("bloom_big")
    val kept = spark.sql("""
      SELECT count(*) FROM bloom_big
      WHERE bloom_might_contain(
        (SELECT bloom_agg(xxhash64(p_partkey), 1000L, 65536L) FROM bloom_dim),
        xxhash64(l_partkey))""")
      .collect().head.getLong(0)
    assert(kept >= want.size, "bloom must never drop a true match")
  }

  test("range join == plain inequality join") {
    val left = (0 until 200).map(i => (i.toLong, i * 7.3 - 100)).toDF("id", "v")
    val right = (0 until 20).map(i => (i.toLong, i * 53.0 - 80, i * 53.0 + 40.0))
      .toDF("rid", "lo", "hi")
    val got = Joins.range(left, "v", right, "lo", "hi", bucketWidth = 60.0)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    val want = left.join(right, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "rid").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }
}
