package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{EditDistance, Graph}

/** Round-3 mining operators: the PassJoin segment filter against the
  * quadratic twin, PageRank invariants on hand graphs, and the transition
  * edge builder. */
class MiningSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------------ edit distance

  test("editDistancePairs equals the quadratic twin on fixture prefixes") {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("s"))
    for (tau <- 1 to 3) {
      val fast = EditDistance.editDistancePairs(d, "s", "doc_id", tau)
        .as[(Long, Long, Int)].collect().toSet
      val brute = EditDistance.editDistancePairsBrute(d, "s", "doc_id", tau)
        .as[(Long, Long, Int)].collect().toSet
      assert(fast == brute, s"tau=$tau: segment filter lost/invented pairs")
    }
  }

  test("editDistancePairs handles length-skewed strings") {
    val df = Seq(
      (1L, "abcdefgh"), (2L, "abcdefg"), (3L, "abcdefghij"),
      (4L, "xbcdefgh"), (5L, "ab"), (6L, "a"), (7L, "abcdefghxy"))
      .toDF("id", "s")
    val fast = EditDistance.editDistancePairs(df, "s", "id", tau = 2)
      .as[(Long, Long, Int)].collect().toSet
    val brute = EditDistance.editDistancePairsBrute(df, "s", "id", tau = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(fast == brute)
    assert(fast.contains((1L, 2L, 1)) && fast.contains((1L, 4L, 1)))
  }

  test("editDistancePairs emits each unordered pair exactly once") {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 30).as("s"))
    val out = EditDistance.editDistancePairs(d, "s", "doc_id", tau = 2)
    assert(out.count() == out.select("id1", "id2").distinct().count())
    assert(out.where(col("id1") >= col("id2")).count() == 0)
  }

  test("editDistanceJoin equals the quadratic cross twin") {
    val docs = Tables(spark, dir, "documents")
    val index = docs.select(col("doc_id"), substring(col("text"), 1, 30).as("t"))
    val probes = docs.where(col("doc_id") % 5 === 0).select(
      col("doc_id").as("pid"),
      concat(substring(col("text"), 1, 10), lit("#"),
        substring(col("text"), 12, 19)).as("p"))
    val fast = graft.ext.EditDistance
      .editDistanceJoin(probes, "p", "pid", index, "t", "doc_id", tau = 2)
      .as[(Long, Long, Int)].collect().toSet
    val brute = graft.ext.EditDistance
      .editDistanceJoinBrute(probes, "p", "pid", index, "t", "doc_id", tau = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(fast == brute)
    // every corrupted probe recovers its own source at distance 1
    val own = fast.filter(t => t._1 == t._2)
    assert(own.nonEmpty && own.forall(_._3 == 1))
  }

  // ----------------------------------------------------------- pagerank

  test("pageRank on a two-node cycle is symmetric and exact") {
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(nodes, edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    // Symmetric graph -> equal ranks; the fixed point of
    // r = 150000 + 85*r/100 is 1e6, reached exactly from r0 = 1e6.
    assert(r(1L) == 1000000L && r(2L) == 1000000L)
  }

  test("pageRank star graph: hub collects mass, leaves keep the floor") {
    // leaves 2,3,4 each point at hub 1; hub points at leaf 2.
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq((2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L), (1L, 2L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(nodes, edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    // One superstep by hand: every node starts at 1e6; hub gets
    // 150000 + 85*3e6/100 = 2700000, leaf 2 gets 1e6, leaves 3,4 get 150000.
    val r1 = Graph.pageRank(nodes, edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 2700000L, 2L -> 1000000L, 3L -> 150000L, 4L -> 150000L))
    assert(r(1L) > r(2L) && r(2L) > r(3L))
    assert(r(3L) == r(4L), "symmetric leaves must tie exactly")
  }

  test("pageRank floor semantics: dangling mass drops, weights steer") {
    // 1 -> 2 (w=3) and 1 -> 3 (w=1); 2 and 3 dangle.
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(nodes, edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    // contrib(1->2) = floor(1e6*3/4) = 750000 -> 150000 + 85*750000/100
    assert(r(2L) == 150000L + 85L * 750000L / 100L)
    assert(r(3L) == 150000L + 85L * 250000L / 100L)
    assert(r(1L) == 150000L)
  }

  test("transitionEdges orders within partition and drops self-loops") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "b"), (1L, 4L, "a"),
      (2L, 1L, "b"), (2L, 2L, "a"))
      .toDF("u", "seq", "item")
    val e = Graph.transitionEdges(ev, "u", "item", Seq("seq"))
      .as[(String, String, Long)].collect().toSet
    assert(e == Set(("a", "b", 1L), ("b", "a", 2L)))
  }

  test("q_sim_recall_pq: shortlist curve is monotone, recall in [0,1]") {
    val r = graft.queries.MiningQueries.qSimRecallPq(spark, dir)
      .orderBy("shortlist")
      .select("shortlist", "recall").as[(Int, Double)].collect().toSeq
    assert(r.map(_._1) == Seq(5, 10, 20))
    assert(r.forall { case (_, rec) => rec >= 0.0 && rec <= 1.0 })
    // one shared candidate pass + prefix settings + exact rerank ->
    // monotone by construction; a violation means the prefix property or
    // the rerank's keep-exact-best contract broke
    assert(r.map(_._2) == r.map(_._2).sorted,
      s"recall not monotone in shortlist: $r")
  }

  test("q_sim_recall_idx: nprobe curve monotone, nprobe=4 of k=4 is exactly 1.0") {
    val r = graft.queries.MiningQueries.qSimRecallIdx(spark, dir)
      .orderBy("nprobe")
      .select("nprobe", "recall").as[(Int, Double)].collect().toSeq
    assert(r.map(_._1) == Seq(1, 2, 4))
    assert(r.map(_._2) == r.map(_._2).sorted,
      s"recall not monotone in nprobe: $r")
    // probing every cell makes IVF == brute on the surviving corpus; the
    // anchor failing means the compacted cells do NOT hold exactly the
    // survivors
    assert(r.last._2 == 1.0, s"nprobe=4 anchor must be exactly 1.0: $r")
  }

  test("q_retrieval_ndcg: curves monotone in nprobe, nprobe=4 exactly 1.0") {
    val r = graft.queries.MiningQueries.qRetrievalNdcg(spark, dir)
      .orderBy("nprobe")
      .select("nprobe", "mrr", "ndcg").as[(Int, Double, Double)]
      .collect().toSeq
    assert(r.map(_._1) == Seq(1, 2, 4))
    assert(r.forall { case (_, m, n) =>
      m >= 0.0 && m <= 1.0 && n >= 0.0 && n <= 1.0 }, s"metrics outside [0,1]: $r")
    // candidate sets grow with nprobe and both metrics reward earlier
    // placement of the same relevant set, so the curves must be monotone
    assert(r.map(_._2) == r.map(_._2).sorted, s"mrr not monotone: $r")
    assert(r.map(_._3) == r.map(_._3).sorted, s"ndcg not monotone: $r")
    // nprobe = 4 of k = 4 probes everything: IVF ranking == brute ranking,
    // and the pre-quantized IDCG makes a perfect ranking EXACTLY 1.0
    assert(r.last._2 == 1.0 && r.last._3 == 1.0,
      s"nprobe=4 anchor must be exactly (1.0, 1.0): $r")
  }

  test("q_retrieval_ndcg_idx: post-lifecycle standing index ranks the survivors exactly at nprobe=4") {
    val r = graft.queries.MiningQueries.qRetrievalNdcgIdx(spark, dir)
      .orderBy("nprobe")
      .select("nprobe", "mrr", "ndcg").as[(Int, Double, Double)]
      .collect().toSeq
    assert(r.map(_._1) == Seq(1, 2, 4))
    assert(r.map(_._2) == r.map(_._2).sorted, s"mrr not monotone: $r")
    assert(r.map(_._3) == r.map(_._3).sorted, s"ndcg not monotone: $r")
    // the anchor failing here means the compacted cells do NOT rank
    // exactly the surviving corpus (append/delete/compact left residue)
    assert(r.last._2 == 1.0 && r.last._3 == 1.0,
      s"nprobe=4 anchor must be exactly (1.0, 1.0): $r")
  }

  test("q_lsh_tuning: chosen row is the argmin under the ordering contract; " +
       "S-curve monotone in bands; tuned banding's measured recall beats " +
       "the default's") {
    val out = graft.queries.MiningQueries.qLshTuning(spark, dir).collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rpb"),
        r.getAs[Int]("k"), r.getAs[Long]("fp_q6"), r.getAs[Long]("fn_q6"),
        r.getAs[Boolean]("feasible"), r.getAs[Long]("score_qi"),
        r.getAs[Boolean]("chosen")))
    assert(out.count(_._8) == 1, "exactly one chosen row")
    // argmin contract recomputed from the OUTPUT: feasible first, then
    // min score, ties to smallest k then bands
    val best = out.minBy(t => (!t._6, t._7, t._3, t._1))
    assert(out.find(_._8).get == best, "chosen must be the ordering's min")
    // the S-curve theorems: at fixed rows-per-band, more bands can only
    // catch more (fn non-increasing, fp non-decreasing)
    out.groupBy(_._2).foreach { case (_, cells) =>
      val byBands = cells.sortBy(_._1)
      byBands.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(b._5 <= a._5, s"fn must not grow with bands: $a -> $b")
        assert(b._4 >= a._4, s"fp must not shrink with bands: $a -> $b")
      }
    }
    // re-measure: candidate recall of the TUNED banding vs the 16x4
    // default against the exact unblocked Jaccard >= 0.5 pair set
    val (cb, cr) = { val c = out.find(_._8).get; (c._1, c._2) }
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).withColumn("blk", lit("x"))
    val exact = graft.ext.Dedup.prefixJaccardPairs(
        docs, "text", "doc_id", "blk", threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
    def recall(k: Int, bands: Int): Double = {
      val cand = graft.ext.Dedup.minhashPairs(docs, "text", "doc_id",
          k = k, bands = bands, minEstimate = 0.0)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.count(cand).toDouble / exact.size
    }
    val tuned = recall(cb * cr, cb)
    val dflt = recall(64, 16)
    assert(tuned >= dflt,
      s"tuned ($cb x $cr) recall $tuned must not trail default (16x4) $dflt")
  }
}
