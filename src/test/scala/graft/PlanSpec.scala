package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{AnalyticsQueries, CoreQueries}

/** Physical-plan quality guards: these queries' 100 TB viability rests on
  * specific plan shapes (map-side-only, single shuffle, pushdown, partial
  * aggregation), so regressions here should fail CI even while results
  * stay correct. Assertions run on the pre-execution plan string — shapes,
  * not runtime stats. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  val dir = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private def shuffles(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  test("pii redaction is pure map-side: no exchange, two-column scan") {
    val p = physical(AnalyticsQueries.qPiiRedact(spark, dir))
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string>"),
      s"scan should prune to 2 columns:\n$p")
  }

  test("funnel: one user_id window shuffle + one expand-distinct shuffle") {
    val p = physical(AnalyticsQueries.qFunnel(spark, dir))
    assert(shuffles(p) == 2, s"expected 2 hash exchanges:\n$p")
    assert(p.contains("Expand"),
      s"3 count-distincts should share one Expand, not per-column plans:\n$p")
    assert("Window \\[min".r.findAllIn(p).length == 3,
      s"stage times should be 3 windows over ONE partitioning:\n$p")
  }

  test("ewma: map-side partial collect_list, single shuffle, pruned scan") {
    val p = physical(AnalyticsQueries.qEwma(spark, dir))
    assert(shuffles(p) == 1, s"expected 1 hash exchange:\n$p")
    assert(p.contains("partial_collect_list"),
      s"collect_list must aggregate map-side:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"collect_list should use the object hash aggregate, not sort-based:\n$p")
    // pruned to exactly (ts, user_id, value); ts's physical type varies by
    // fixture generation (bigint nanos vs timestamp_ntz), so match either
    assert("ReadSchema: struct<ts:(bigint|timestamp_ntz|timestamp),user_id:bigint,value:double>".r
      .findFirstIn(p).isDefined,
      s"scan should prune to 3 columns:\n$p")
  }

  test("flagship q1: filter pushed through the wrangle layer into the scan") {
    val p = physical(CoreQueries.q1(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter must reach the parquet scan:\n$p")
    assert(!p.contains("l_orderkey"),
      s"unused columns must be pruned from the scan:\n$p")
    assert(p.contains("partial_sum"), s"aggregation must be two-phase:\n$p")
  }

  test("tfidf: window rank reuses the id partitioning; df broadcasts back") {
    val p = physical(graft.ext.TextAnalysis.tfidfTopTerms(
      Tables(spark, dir, "documents"), "text", "doc_id", 5))
    // No exchange between the scoring join and the per-id window: the
    // repartition(id) feeding tf must satisfy the window's distribution.
    val between = p.substring(p.indexOf("Window ["), p.indexOf("BroadcastNestedLoopJoin"))
    assert(!between.contains("Exchange"),
      s"window must reuse the id partitioning, not re-shuffle:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k must push a group-limit below the full window sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"df must broadcast back:\n$p")
  }

  test("histogram: agg shuffle + tiny window re-shuffle only") {
    val p = physical(AnalyticsQueries.qHistogram(spark, dir))
    assert(shuffles(p) <= 2, s"expected at most 2 hash exchanges:\n$p")
    assert(p.contains("partial_count"), s"count must be two-phase:\n$p")
  }

  test("editdist join: equality candidate join; only the bounded short-string cross") {
    val p = physical(graft.queries.MiningQueries.qEditdistJoin(spark, dir))
    // exactly one non-equi join is allowed: the <=2τ-char short-string
    // side branch (pigeonhole needs τ+1 nonempty segments); the candidate
    // path itself must stay an equality join
    val nonEqui = "CartesianProduct".r.findAllIn(p).length +
      "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(nonEqui <= 1, s"candidate generation must be an equi-join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"the segment join must be a hash/merge equi-join:\n$p")
    // bounded 3-arg verify, not the full DP
    assert(p.contains("levenshtein") && p.contains("Some(3)"),
      s"verify must use the threshold levenshtein:\n$p")
  }

  test("sparse sim: posting-list stages reused across self-join sides") {
    val df = graft.queries.MiningQueries.qSparseSim(spark, dir)
    // exchange reuse is an AQE runtime decision, and count() would plan a
    // DIFFERENT query — collect THIS df, then read its final plan
    df.collect()
    val p = physical(df)
    assert(p.contains("ReusedQueryStage") || p.contains("ReusedExchange"),
      s"kept posting list should be computed once and reused:\n$p")
    assert(p.contains("partial_sum"),
      s"dot products must pre-aggregate map-side:\n$p")
  }

  test("rank boundaries: no single-task whole-group sort of the fact table") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    // Both queries' windows must be bounded: either partitioned by
    // (group, bucket[, pname]) — parallel slices — or the per-group
    // cumulative over the ≤`buckets`-row bucket subtotals (ordered by the
    // bucket id, never by the raw value). A `PARTITION BY group ORDER BY
    // value` window over fact rows (3 groups = 3 sort tasks at 100 TB)
    // fails both arms.
    val dfs = Seq(
      graft.queries.MiningQueries.qWinsorize(spark, dir),
      graft.queries.RelationalQueries.qPercentileDisc(spark, dir))
    for (df <- dfs) {
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val wins = root.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, "the histogram cumsum windows should be present")
      wins.foreach { w =>
        val sliceParallel = w.partitionSpec.size >= 2
        val boundedBucketCumsum =
          w.orderSpec.forall(_.child.references.exists(_.name.contains("bkt")))
        assert(sliceParallel || boundedBucketCumsum,
          s"unbounded per-group sort window: ${w.partitionSpec} order ${w.orderSpec}")
      }
    }
    // the clamp must come back as a broadcast join, not a shuffle
    val p = physical(graft.queries.MiningQueries.qWinsorize(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"boundaries must broadcast back for a map-side clamp:\n$p")
  }

  test("pagerank: edge pipeline materialized once, supersteps scan it") {
    val df = graft.queries.MiningQueries.qPagerank(spark, dir)
    val p = physical(df)
    // the 5 supersteps must join the checkpointed edges, not re-run the
    // lag-window edge derivation each iteration
    assert(!p.contains("Window"),
      s"edge derivation must not re-run inside the iteration:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 5,
      s"each superstep should scan the materialized edges:\n$p")
  }

  test("vector expressions all participate in whole-stage codegen: no " +
       "CodegenFallback anywhere in the SQ8 / LSH / semdedup plans") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    def fallbacks(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val root = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      root.collect { case p =>
        p.expressions.flatMap(_.collect {
          case e: CodegenFallback => e.getClass.getSimpleName
        })
      }.flatten.distinct
    }
    // each plan exercises one of the four formerly-interpreted
    // expressions (plus CosineSimilarity/DotProduct on the same path)
    val plans = Seq(
      "sq8" -> graft.queries.ExtQueries.qSimSq8(spark, dir),
      "lsh" -> graft.queries.ExtQueries.qSimLsh(spark, dir),
      "semdedup" -> graft.queries.ExtQueries.qSemDedup(spark, dir),
      "kmeans" -> graft.queries.ExtQueries.qKmeans(spark, dir))
    for ((name, df) <- plans) {
      val bad = fallbacks(df).filter(_.startsWith("Sq8")) ++
        fallbacks(df).filter(n =>
          n == "HyperplaneBuckets" || n == "CentroidCosines" ||
            n == "CosineSimilarity" || n == "DotProduct")
      assert(bad.isEmpty,
        s"[$name] interpreted vector expressions in the plan: $bad")
    }
    // and the generated path computes the same thing the interpreted
    // path did: evaluate one quantize+reconstruct round-trip both ways
    import spark.implicits._
    import graft.functions.VectorExpressions._
    import org.apache.spark.sql.functions.col
    val vecs = Tables(spark, dir, "embeddings").select(col("embedding"))
    val both = vecs
      .withColumn("s", sq8Quantize(col("embedding")))
      .withColumn("r", sq8Reconstruct(col("s.mn"), col("s.sc"), col("s.q")))
      .withColumn("c", cosineSim(col("embedding"), col("r")))
      .withColumn("h", hyperplaneBuckets(col("embedding"),
        Seq(Seq(Seq.tabulate(64)(i => math.sin(i + 1.0)),
          Seq.tabulate(64)(i => math.cos(2.0 * i))))))
      .withColumn("cc", centroidCosines(col("embedding"),
        Seq(Seq.tabulate(64)(i => 1.0 / (i + 1)))))
    val viaCodegen = both.collect()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interpreted = both.collect()
      assert(viaCodegen.sameElements(interpreted),
        "generated and interpreted vector expression results diverge")
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("auto-scaled packing tokenizes the corpus exactly once") {
    // The total-token scalar and the windowed branch both need the token
    // counts; the checkpoint in packSequences must make the windowed plan
    // read the materialized (id, n_tokens) frame instead of re-running
    // the tokenizer over the text a second time.
    val p = physical(graft.ext.Packing.packSequences(
      Tables(spark, dir, "documents"), "text", "doc_id", budget = 4096))
    assert(p.contains("Scan ExistingRDD"),
      s"windowed branch should read the checkpointed token frame:\n$p")
    assert(!p.contains("split("),
      s"tokenization must not re-run inside the windowed branch:\n$p")
  }

  test("span index probe: the index side aggregates without any exchange") {
    import spark.implicits._
    import graft.ext.SpanIndex
    SpanIndex.write(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"),
      "text", "doc_id", "t_plan_span", w = 6, buckets = 2)
    val delta = Seq((2L, "alpha beta gamma delta epsilon zeta x y"))
      .toDF("doc_id", "text")
    val p = physical(SpanIndex.trimIncremental(spark, "t_plan_span",
      delta, "text", "doc_id"))
    // the probe's whole point at 100 TB: the bucketed scan satisfies the
    // distinct + refcount-sum clustering, so the INDEX side never
    // exchanges — only the delta shuffles
    val scanAt = p.indexOf("t_plan_span_spanh")
    assert(scanAt > 0, s"expected a scan of the span index table:\n$p")
    assert(p.substring(0, scanAt).contains("Bucketed: true") ||
      p.substring(scanAt, math.min(p.length, scanAt + 600)).contains("Bucketed: true"),
      s"index scan must use the bucket layout:\n$p")
    val liveAt = p.indexOf("__n")
    assert(liveAt > 0 && liveAt < scanAt,
      s"expected the live-hash refcount filter above the index scan:\n$p")
    assert(!p.substring(liveAt, scanAt).contains("Exchange"),
      s"index-side refcount aggregation must be exchange-free:\n$p")
  }
}
