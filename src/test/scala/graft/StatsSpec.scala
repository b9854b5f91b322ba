package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact-power-sum statistics (q_stats) must agree with Spark's own
  * streaming aggregates to numerical tolerance — the power-sum form exists
  * for cross-engine bit-parity, not different semantics. */
class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("power-sum stddev/covar/corr == built-in aggregates (1e-9 rel)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.RelationalQueries.qStats(spark, dir)
      .select("returnflag", "sd_qty", "covar", "corr")
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    val ref = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        corr(col("l_quantity"), col("l_extendedprice")).as("co"))
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    def close(a: Double, b: Double) =
      math.abs(a - b) <= 1e-9 * math.max(math.abs(a), math.abs(b))
    got.foreach { case (k, (_, sd, cv, co)) =>
      val (_, rsd, rcv, rco) = ref(k)
      assert(close(sd, rsd), s"$k stddev: $sd vs $rsd")
      assert(close(cv, rcv), s"$k covar: $cv vs $rcv")
      assert(close(co, rco), s"$k corr: $co vs $rco")
    }
  }
}
