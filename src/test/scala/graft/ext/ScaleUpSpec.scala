package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The scale-rehearsal fixture generator must produce a referentially
  * consistent corpus: every copy a self-consistent shard (no FK
  * orphans, original join fan-outs preserved), exact dedup clean across
  * copies, derived columns recomputed. A subtly-broken scale-up would
  * invalidate every slope the rehearsal measures. */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  val src = "/root/testdata/sf0.001"
  lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaleup").toString
    graft.tools.ScaleUp.run(spark, src, dir, factor = 2)
    dir
  }

  private def t(name: String) = spark.read.parquet(s"$out/$name.parquet")
  private def srcT(name: String) = spark.read.parquet(s"$src/$name.parquet")

  test("row counts scale by the factor; fixed dimensions don't") {
    for (tab <- Seq("customer", "supplier", "part", "orders", "lineitem",
                    "events", "documents", "embeddings"))
      assert(t(tab).count() == 2 * srcT(tab).count(), tab)
    for (tab <- Seq("region", "nation"))
      assert(t(tab).count() == srcT(tab).count(), tab)
  }

  test("no foreign-key orphans in any scaled table") {
    def orphans(fact: String, fk: String, dim: String, pk: String) =
      t(fact).select(col(fk).as("k"))
        .join(t(dim).select(col(pk).as("k")), Seq("k"), "left_anti").count()
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") == 0)
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0)
  }

  test("per-copy join fan-outs equal the original's") {
    // lines per order must have the same distribution as the source —
    // the copies are shards, not interleaved key collisions
    def dist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .groupBy("n").agg(count(lit(1)).as("orders"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val s = dist(srcT("lineitem"))
    val d = dist(t("lineitem"))
    assert(d == s.map { case (n, c) => (n, 2 * c) })
  }

  test("documents stay exact-dedup-clean across copies; n_chars consistent") {
    val docs = t("documents")
    assert(docs.select("text").distinct().count() == docs.count(),
      "copy mutation failed: exact duplicate texts across copies")
    assert(docs.filter(length(col("text")).cast("long") =!= col("n_chars"))
      .count() == 0, "n_chars not recomputed for mutated texts")
    // keys unique after the stride shift
    assert(docs.select("doc_id").distinct().count() == docs.count())
  }
}
