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

  test("rank boundaries stay bounded and exact on heavy-tailed distributions") {
    import org.apache.spark.sql.Column
    val n = 50000
    // deterministic inverse-CDF samples — no RNG, stable across runs:
    // exponential (rate 1) and Pareto (xm = 1, alpha = 0.5 — the extreme
    // tail: the max is ~n² × the median, which collapses a linear
    // value-range histogram into one cell)
    val u = (1 to n).map(i => i.toDouble / (n + 1))
    val data = u.map(x => ("exp", -math.log(1 - x))) ++
      u.map(x => ("pareto", 1.0 / (x * x)))
    val df = spark.createDataFrame(data).toDF("grp", "v")
    val positions: Seq[(String, Column => Column)] = Seq(
      "p50" -> ((c: Column) => ceil(c * 0.5).cast("long")),
      "p99" -> ((c: Column) => ceil(c * 0.99).cast("long")))
    // 1) every final window partition is bounded by a CONSTANT, not by
    // |distinct|: bit-space bucketing + one refinement = 4096² effective
    // cells over 50k distinct values per group
    val sizes = graft.exec.RankBoundaries
      .finalSliceSizes(df, "grp", "v", positions)
      .agg(max("slice_rows")).collect().head.getLong(0)
    assert(sizes <= 32, s"boundary slice grew data-scaled: $sizes rows")
    // 2) still exact: matches the monolithic sort-window formulation
    val got = graft.exec.RankBoundaries.valuesAt(df, "grp", "v", positions)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    val expect = data.groupBy(_._1).map { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      k -> ((sorted((n / 2) - 1 + n % 2), sorted(math.ceil(n * 0.99).toInt - 1)))
    }
    assert(got.keySet == Set("exp", "pareto"))
    got.foreach { case (k, (p50, p99)) =>
      assert(p50 == expect(k)._1, s"$k p50: $p50 vs ${expect(k)._1}")
      assert(p99 == expect(k)._2, s"$k p99: $p99 vs ${expect(k)._2}")
    }
  }
}
