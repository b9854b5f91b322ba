package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The oracle replays the exact SQL; this spec pins the SEMANTICS on a
  * hand-computed fixture: extremes + margin filter + deterministic
  * tie-breaks for pairs, batch boundaries + exact means for best-of-n. */
class PreferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  // (group, id, score)
  private def fix = Seq(
    ("p1", 1L, 1.0), ("p1", 2L, 9.0), ("p1", 3L, 5.0),   // margin 8
    ("p2", 4L, 4.0), ("p2", 5L, 4.5),                    // margin 0.5 — filtered at 2.0
    ("p3", 6L, 7.0), ("p3", 7L, 7.0), ("p3", 8L, 1.0),   // tied max: chosen = id 6
    ("p4", 9L, 3.0)                                      // singleton — never a pair
  ).toDF("g", "id", "score")

  test("pairs: extremes, margin filter, singleton exclusion") {
    val out = Preference.pairs(fix, Seq("g"), "id", "score", minMargin = 2.0)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Double]("margin")))).toMap
    assert(out.keySet == Set("p1", "p3"))
    assert(out("p1") == ((2L, 1L, 8.0)))
    assert(out("p3") == ((6L, 8L, 6.0)), "tied chosen must break to smallest id")
  }

  test("pairs: an all-tied group at minMargin 0 never emits a self-pair") {
    // Margin 0 passes >= 0 and both extremes tie-break to the smallest
    // id — without the degenerate-pair guard this emitted (1, 1).
    val t = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 5.0)).toDF("g", "id", "score")
    assert(Preference.pairs(t, Seq("g"), "id", "score", minMargin = 0.0).isEmpty)
    // A distinct-extreme group at margin 0 still passes.
    val t2 = Seq(("g", 1L, 5.0), ("g", 2L, 7.0)).toDF("g", "id", "score")
    val r2 = Preference.pairs(t2, Seq("g"), "id", "score", minMargin = 0.0).collect()
    assert(r2.length == 1 && r2.head.getAs[Long]("chosen_id") == 2L)
  }

  test("pairs: tied minimum breaks rejected to smallest id") {
    val t = Seq(("g", 1L, 2.0), ("g", 2L, 2.0), ("g", 3L, 8.0)).toDF("g", "id", "score")
    val r = Preference.pairs(t, Seq("g"), "id", "score", minMargin = 1.0).collect().head
    assert(r.getAs[Long]("chosen_id") == 3L && r.getAs[Long]("rejected_id") == 1L)
  }

  test("bestOfN: batch boundaries in id order, winner and exact mean per batch") {
    val t = Seq(
      ("u", 1L, 1.0), ("u", 2L, 4.0), ("u", 3L, 2.0), ("u", 4L, 3.0), // batch 0
      ("u", 5L, 10.0), ("u", 6L, 0.5)                                 // batch 1 (partial)
    ).toDF("g", "id", "score")
    val out = Preference.bestOfN(t, Seq("g"), "id", "score", n = 4)
      .orderBy("batch").collect()
    assert(out.length == 2)
    val b0 = out(0)
    assert(b0.getAs[Long]("batch") == 0L && b0.getAs[Long]("n_in_batch") == 4L)
    assert(b0.getAs[Long]("best_id") == 2L && b0.getAs[Double]("best_score") == 4.0)
    assert(b0.getAs[Double]("pool_avg") == 2.5 && b0.getAs[Double]("uplift") == 1.5)
    val b1 = out(1)
    assert(b1.getAs[Long]("batch") == 1L && b1.getAs[Long]("n_in_batch") == 2L)
    assert(b1.getAs[Long]("best_id") == 5L && b1.getAs[Double]("pool_avg") == 5.25)
  }

  test("btRatings: two-item MM fixed point reached exactly") {
    // A beats B 3-1: W_A=3, W_B=1, n_AB=4. Iter 1: S=4/(1+1)=2 so
    // gamma=(1.5, 0.5); that's already the fixed point (S=4/(1.5+0.5)=2).
    val comp = Seq(("A", "B", 3L), ("B", "A", 1L)).toDF("winner", "loser", "n")
    val out = Preference.btRatings(comp, iters = 3).collect()
      .map(r => r.getAs[String]("item") ->
        ((r.getAs[Long]("n_wins"), r.getAs[Long]("n_comparisons"),
          r.getAs[Double]("gamma")))).toMap
    assert(out("A") == ((3L, 4L, 1.5)) && out("B") == ((1L, 4L, 0.5)))
  }

  test("btRatings: zero-win items rate 0 and never divide by zero") {
    // A beats B twice and C once; B and C never win. S_A stabilizes at
    // 1.5 so gamma_A = 2.0; gamma_B = gamma_C = 0.
    val comp = Seq(("A", "B", 2L), ("A", "C", 1L)).toDF("winner", "loser", "n")
    val out = Preference.btRatings(comp, iters = 3).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Double]("gamma")).toMap
    assert(out("A") == 2.0 && out("B") == 0.0 && out("C") == 0.0)
  }

  test("btBootstrapCi: deterministic, ordered bounds, zero-win items pin to zero") {
    val comp = Seq(("A", "B", 30L), ("B", "A", 10L), ("A", "C", 5L))
      .toDF("winner", "loser", "n")
    val ci = Preference.btBootstrapCi(comp, iters = 3, reps = 100,
      loRank = 3, hiRank = 98)
    val out = ci.collect().map(r => r.getAs[String]("item") ->
      ((r.getAs[Double]("lo"), r.getAs[Double]("hi")))).toMap
    assert(out.keySet == Set("A", "B", "C"))
    out.values.foreach { case (lo, hi) => assert(lo >= 0.0 && lo <= hi) }
    // C never wins: every replicate rates it 0, so the interval is [0, 0]
    assert(out("C") == ((0.0, 0.0)))
    // A dominates B 3:1 — its interval should sit above B's
    assert(out("A")._1 > out("B")._2,
      s"A's lower bound must clear B's upper: $out")
    // pure hash draws: a second run is bit-identical
    val again = Preference.btBootstrapCi(comp, iters = 3, reps = 100,
      loRank = 3, hiRank = 98).collect()
      .map(r => r.getAs[String]("item") ->
        ((r.getAs[Double]("lo"), r.getAs[Double]("hi")))).toMap
    assert(again == out)
  }

  test("rkRatings: hand-computed two-item fit with ties; theta reflects draw mass") {
    // A beats B twice, two draws. Iter 1 from (1,1,theta=1):
    // a_AB = 4, a_BA = 2; S_A = 4/2 + 2/2 = 3 -> gamma_A = 4/3;
    // S_B = 2/2 + 4/2 = 3 -> gamma_B = 2/3. C = 8/3 (both terms 4/3),
    // theta = (2 + sqrt(4 + 64/9)) / (8/3) = 2 exactly (up to the
    // quantized C).
    val comp = Seq(("A", "B", 2L)).toDF("winner", "loser", "n")
    val tie = Seq(("A", "B", 2L)).toDF("a", "b", "n")
    val out = Preference.rkRatings(comp, tie, iters = 1).collect()
      .map(r => r.getAs[String]("item") -> r).toMap
    assert(math.abs(out("A").getAs[Double]("gamma") - 4.0 / 3) < 1e-6)
    assert(math.abs(out("B").getAs[Double]("gamma") - 2.0 / 3) < 1e-6)
    assert(math.abs(out("A").getAs[Double]("theta") - 2.0) < 1e-6)
    assert(out("A").getAs[Long]("n_wins") == 2L)
    assert(out("A").getAs[Long]("n_ties") == 2L)
    assert(out("A").getAs[Long]("n_comparisons") == 4L)
    assert(out("B").getAs[Long]("n_wins") == 0L)
    assert(out("B").getAs[Long]("n_comparisons") == 4L)
  }

  test("rkRatings: zero ties reduces to plain BT (theta = 1)") {
    val comp = Seq(("A", "B", 3L), ("B", "A", 1L)).toDF("winner", "loser", "n")
    val empty = Seq.empty[(String, String, Long)].toDF("a", "b", "n")
    val rk = Preference.rkRatings(comp, empty, iters = 3).collect()
      .map(r => r.getAs[String]("item") ->
        ((r.getAs[Double]("gamma"), r.getAs[Double]("theta")))).toMap
    val bt = Preference.btRatings(comp, iters = 3).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Double]("gamma")).toMap
    rk.foreach { case (item, (gamma, theta)) =>
      assert(math.abs(theta - 1.0) < 1e-9, s"theta must stay ~1: $theta")
      assert(math.abs(gamma - bt(item)) < 1e-6,
        s"$item: rk $gamma vs bt ${bt(item)}")
    }
  }

  test("rkBootstrapCi: ordered bounds for gamma and theta; no-tie data pins theta interval to 1") {
    val comp = Seq(("A", "B", 30L), ("B", "A", 10L)).toDF("winner", "loser", "n")
    val tie = Seq(("A", "B", 8L)).toDF("a", "b", "n")
    val out = Preference.rkBootstrapCi(comp, tie, iters = 3, reps = 100,
      loRank = 3, hiRank = 98).collect()
    assert(out.map(_.getAs[String]("item")).toSet == Set("A", "B"))
    out.foreach { r =>
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
      assert(r.getAs[Double]("theta_lo") <= r.getAs[Double]("theta_hi"))
      assert(r.getAs[Double]("theta_lo") >= 1.0, "Rao-Kupper theta >= 1")
    }
    // with NO ties every replicate's T is 0, so theta = 1 in all of them
    val empty = Seq.empty[(String, String, Long)].toDF("a", "b", "n")
    val nt = Preference.rkBootstrapCi(comp, empty, iters = 3, reps = 100,
      loRank = 3, hiRank = 98).collect().head
    assert(nt.getAs[Double]("theta_lo") == 1.0 &&
      nt.getAs[Double]("theta_hi") == 1.0)
  }

  test("rkBootstrapCiGrouped: window 0 reproduces ungrouped rkBootstrapCi " +
       "bit-exactly; bounds ordered and theta >= 1 in every window") {
    val comp0 = Seq(("A", "B", 30L), ("B", "A", 10L), ("B", "C", 5L))
      .toDF("winner", "loser", "n")
    val tie0 = Seq(("A", "B", 8L)).toDF("a", "b", "n")
    val solo = Preference.rkBootstrapCi(comp0, tie0, iters = 3, reps = 100,
        loRank = 3, hiRank = 98).collect()
      .map(r => (r.getAs[String]("item"),
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"),
         r.getAs[Double]("theta_lo"), r.getAs[Double]("theta_hi")))).toMap
    // window 0 = exactly the solo data (composite key 0*reps+r = r, so
    // every count draw hashes identically); window 7 = different data
    val comp = comp0.withColumn("b", lit(0L)).unionByName(
      Seq(("C", "A", 4L)).toDF("winner", "loser", "n")
        .withColumn("b", lit(7L)))
    val tie = tie0.select(col("a").as("i"), col("b").as("j"), col("n"))
      .withColumn("b", lit(0L)).unionByName(
        Seq(("A", "C", 2L)).toDF("i", "j", "n").withColumn("b", lit(7L)))
    val g = Preference.rkBootstrapCiGrouped(comp, tie, iters = 3,
      reps = 100, loRank = 3, hiRank = 98).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
      assert(r.getAs[Double]("theta_lo") <= r.getAs[Double]("theta_hi"))
      assert(r.getAs[Double]("theta_lo") >= 1.0)
    }
    val w0 = g.filter(_.getAs[Long]("b") == 0L)
    assert(w0.map(_.getAs[String]("item")).toSet == solo.keySet)
    w0.foreach { r =>
      val s = solo(r.getAs[String]("item"))
      assert((r.getAs[Double]("lo"), r.getAs[Double]("hi"),
        r.getAs[Double]("theta_lo"), r.getAs[Double]("theta_hi")) == s,
        s"window-0 grouped CI must equal the solo fit bit-exactly")
    }
  }

  test("q_rk_drift_ci: intervals ordered, theta'd, sig_move iff the item's " +
       "intervals separate across consecutive windows") {
    val out = graft.queries.TrainPrepQueries
      .qRkDriftCi(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("lo_q6") <= r.getAs[Long]("hi_q6"))
      assert(r.getAs[Long]("theta_lo_q6") <= r.getAs[Long]("theta_hi_q6"))
      assert(r.getAs[Long]("theta_lo_q6") >= 1000000L,
        "quantized Rao-Kupper theta >= 1")
    }
    val ci = out.map(r => ((r.getAs[Long]("window_id"),
      r.getAs[String]("item")),
      (r.getAs[Long]("lo_q6"), r.getAs[Long]("hi_q6")))).toMap
    out.groupBy(_.getAs[String]("item")).foreach { case (it, rows) =>
      val seq = rows.sortBy(_.getAs[Long]("window_id"))
      assert(!seq.head.getAs[Boolean]("sig_move"),
        s"$it: first window cannot be a significant move")
      seq.sliding(2).filter(_.length == 2).foreach { case Array(p, c) =>
        val (plo, phi) = ci((p.getAs[Long]("window_id"), it))
        val (clo, chi) = ci((c.getAs[Long]("window_id"), it))
        val sig = c.getAs[Boolean]("sig_move")
        if (clo > phi || chi < plo)
          assert(sig, s"$it: quantized-separated intervals must flag sig_move")
        if (sig)
          assert(clo >= phi || chi <= plo,
            s"$it: sig_move requires at least quantized-boundary separation")
      }
    }
  }

  test("PreferenceIndex.compactBatched: retires tombstones keeping batch " +
       "history; fully-withdrawn batches drop; re-admission lands fresh") {
    val base = java.nio.file.Files.createTempDirectory("graft_pref").toString +
      "/idx"
    def counts(rows: (String, String, Long)*) =
      rows.toDF("winner", "loser", "n")
    PreferenceIndex.appendCounts(spark, base,
      counts(("A", "B", 3L), ("B", "C", 2L)), batchId = 0L)
    PreferenceIndex.appendCounts(spark, base,
      counts(("C", "A", 1L)), batchId = 1L)       // all rows touch C
    PreferenceIndex.withdraw(spark, base, Seq("C").toDF("item"), "item", 2L)
    def mb() = PreferenceIndex.matrixByBatch(spark, base)
      .as[(Long, String, String, Long)].collect().toSet
    // masked view before retirement: every C edge dead, batch 1 empty
    assert(mb() == Set((0L, "A", "B", 3L)))
    PreferenceIndex.compactBatched(spark, base)
    // physical state now equals the masked view; batch 1's dir is gone
    assert(mb() == Set((0L, "A", "B", 3L)))
    assert(!new java.io.File(s"$base/edges/batch_id=1").exists(),
      "fully-withdrawn batch must be dropped, not resurrected")
    assert(!new java.io.File(s"$base/tombs").exists, "tombstones retired")
    // re-admission: C re-enters as a fresh late batch and is LIVE
    PreferenceIndex.appendCounts(spark, base,
      counts(("C", "A", 5L)), batchId = 3L)
    assert(mb() == Set((0L, "A", "B", 3L), (3L, "C", "A", 5L)))
    // the one-shot matrix agrees with the per-batch view folded
    val m = PreferenceIndex.matrix(spark, base)
      .as[(String, String, Long)].collect().toSet
    assert(m == Set(("A", "B", 3L), ("C", "A", 5L)))
  }

  test("compactBatched is PARTIAL: clean delta partitions are never " +
       "rewritten, only tombstone-dirty ones") {
    val base = java.nio.file.Files.createTempDirectory("graft_pref").toString +
      "/idx"
    def counts(rows: (String, String, Long)*) =
      rows.toDF("winner", "loser", "n")
    PreferenceIndex.appendCounts(spark, base,
      counts(("A", "B", 3L)), batchId = 0L)           // clean under the takedown
    PreferenceIndex.appendCounts(spark, base,
      counts(("C", "A", 1L), ("A", "B", 7L)), batchId = 1L) // dirty, survivors
    PreferenceIndex.withdraw(spark, base, Seq("C").toDF("item"), "item", 2L)
    def files(b: Long) = new java.io.File(s"$base/edges/batch_id=$b")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
    val clean = files(0L)
    val dirty = files(1L)
    PreferenceIndex.compactBatched(spark, base)
    assert(files(0L) == clean,
      "a partition holding no withdrawn rows must carry over untouched")
    assert(files(1L) != dirty, "the dirty partition must rewrite")
    assert(PreferenceIndex.matrixByBatch(spark, base)
      .as[(Long, String, String, Long)].collect().toSet ==
      Set((0L, "A", "B", 3L), (1L, "A", "B", 7L)))
  }

  test("compactBatched discovery: the broadcast fallback (tombstones above " +
       "the IN-list cap) retires identically to the IN-literal path") {
    def build(): String = {
      val base = java.nio.file.Files.createTempDirectory("graft_pref")
        .toString + "/idx"
      def counts(rows: (String, String, Long)*) =
        rows.toDF("winner", "loser", "n")
      PreferenceIndex.appendCounts(spark, base,
        counts(("A", "B", 3L)), batchId = 0L)
      PreferenceIndex.appendCounts(spark, base,
        counts(("C", "A", 1L), ("A", "B", 7L), ("D", "B", 2L)), batchId = 1L)
      PreferenceIndex.appendCounts(spark, base,
        counts(("D", "C", 4L)), batchId = 2L)
      PreferenceIndex.withdraw(spark, base,
        Seq("C", "D").toDF("item"), "item", 3L)
      base
    }
    val bIn = build(); val bBc = build()
    PreferenceIndex.compactBatched(spark, bIn)                // IN-literal
    PreferenceIndex.compactBatched(spark, bBc,
      discoveryInListMax = 1)                                 // 2 tombs > 1
    def state(b: String) = PreferenceIndex.matrixByBatch(spark, b)
      .as[(Long, String, String, Long)].collect().toSet
    assert(state(bIn) == state(bBc))
    assert(state(bIn) == Set((0L, "A", "B", 3L), (1L, "A", "B", 7L)))
    Seq(bIn, bBc).foreach { b =>
      assert(!new java.io.File(s"$b/tombs").exists, "tombstones retired")
      assert(!new java.io.File(s"$b/edges/batch_id=2").exists(),
        "fully-withdrawn batch dropped on both discovery paths")
    }
  }

  test("tiesByBatch: per-window tie state equals the batch aggregation, " +
       "delete-wins masks draws in every window") {
    val base = java.nio.file.Files.createTempDirectory("graft_pref").toString +
      "/idx"
    val judg = Seq(
      (0L, "A", "B", "a"), (0L, "A", "C", "tie"), (0L, "B", "C", "tie"),
      (1L, "C", "A", "tie"), (1L, "B", "A", "b")).toDF("b", "ia", "ib", "oc")
    Seq(0L, 1L).foreach { w =>
      PreferenceIndex.appendJudgments(spark, base,
        judg.filter(col("b") === w), "ia", "ib", "oc", batchId = w)
    }
    def tb() = PreferenceIndex.tiesByBatch(spark, base)
      .as[(Long, String, String, Long)].collect().toSet
    // the index state equals aggregating the judgment log directly
    assert(tb() == Set((0L, "A", "C", 1L), (0L, "B", "C", 1L),
      (1L, "A", "C", 1L)))
    // withdrawal masks the item's draws in EVERY window, batch order
    // notwithstanding (delete-wins)
    PreferenceIndex.withdraw(spark, base, Seq("C").toDF("item"), "item", 2L)
    assert(tb() == Set.empty)
    // and the wins view agrees: only the A-beats-B edges survive
    assert(PreferenceIndex.matrixByBatch(spark, base)
      .as[(Long, String, String, Long)].collect().toSet ==
      Set((0L, "A", "B", 1L), (1L, "A", "B", 1L)))
  }

  test("pairWinRates: hand-checked Wilson cell; ties count half; interval brackets p") {
    val comp = Seq(("a", "b", 3L), ("b", "a", 1L), ("c", "d", 100L))
      .toDF("winner", "loser", "n")
    val ties = Seq(("a", "b", 2L)).toDF("a", "b", "n")
    val out = Preference.pairWinRates(comp, ties, z = 1.96).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("n"), r.getAs[Double]("p"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out.map(t => (t._1, t._2, t._3)) == Seq(("a", "b", 6L), ("c", "d", 100L)))
    val ab = out.head
    assert(math.abs(ab._4 - 4.0 / 6.0) < 1e-12, "ties contribute half a win")
    out.foreach { t =>
      // Wilson stays strictly inside (0,1) and brackets interior p-hats;
      // a boundary p-hat (100-0) sits ABOVE hi — the shrink toward 1/2
      // is the point of the score interval at extreme observed rates
      assert(t._5 >= 0.0 && t._6 <= 1.0, s"interval inside [0,1]: $t")
      if (t._4 > 0.0 && t._4 < 1.0)
        assert(t._5 < t._4 && t._4 < t._6, s"interior p-hat bracketed: $t")
    }
    // 100-0 is decisive (lo far above 0.5); 3.5-of-6 is not
    assert(out(1)._5 > 0.9)
    assert(ab._5 < 0.5 && ab._6 > 0.5)
  }

  test("btRatingsGrouped: independent groups fit exactly like separate btRatings runs") {
    val e0 = Seq(("a", "b", 4L), ("b", "c", 2L), ("a", "c", 1L))
    val e1 = Seq(("b", "a", 3L), ("a", "b", 1L))
    val grouped = (e0.map { case (w, l, n) => (0L, w, l, n) } ++
      e1.map { case (w, l, n) => (1L, w, l, n) })
      .toDF("b", "winner", "loser", "n")
    val got = Preference.btRatingsGrouped(grouped, iters = 3).collect()
      .map(r => ((r.getAs[Long]("b"), r.getAs[String]("item")),
        r.getAs[Double]("gamma"))).toMap
    val want0 = Preference.btRatings(e0.toDF("winner", "loser", "n"), iters = 3)
      .collect().map(r => (r.getAs[String]("item"), r.getAs[Double]("gamma")))
    val want1 = Preference.btRatings(e1.toDF("winner", "loser", "n"), iters = 3)
      .collect().map(r => (r.getAs[String]("item"), r.getAs[Double]("gamma")))
    assert(got.size == want0.length + want1.length)
    want0.foreach { case (it, g) => assert(got((0L, it)) == g,
      s"group 0 item $it drifted from the ungrouped fit") }
    want1.foreach { case (it, g) => assert(got((1L, it)) == g,
      s"group 1 item $it drifted from the ungrouped fit") }
  }

  test("rkRatingsGrouped: independent groups fit exactly like separate rkRatings runs") {
    val e0 = Seq(("a", "b", 4L), ("b", "c", 2L))
    val t0 = Seq(("a", "b", 3L), ("b", "c", 1L))
    val e1 = Seq(("b", "a", 3L), ("a", "b", 1L))
    val t1 = Seq.empty[(String, String, Long)] // no draws: theta pins to 1
    val compG = (e0.map { case (w, l, n) => (0L, w, l, n) } ++
      e1.map { case (w, l, n) => (1L, w, l, n) })
      .toDF("b", "winner", "loser", "n")
    val tieG = (t0.map { case (x, y, n) => (0L, x, y, n) } ++
      t1.map { case (x, y, n) => (1L, x, y, n) })
      .toDF("b", "i", "j", "n")
    val got = Preference.rkRatingsGrouped(compG, tieG, iters = 3).collect()
      .map(r => ((r.getAs[Long]("b"), r.getAs[String]("item")),
        (r.getAs[Double]("gamma"), r.getAs[Double]("theta")))).toMap
    def solo(es: Seq[(String, String, Long)], ts: Seq[(String, String, Long)]) =
      Preference.rkRatings(es.toDF("winner", "loser", "n"),
          ts.toDF("a", "b", "n"), iters = 3).collect()
        .map(r => (r.getAs[String]("item"),
          (r.getAs[Double]("gamma"), r.getAs[Double]("theta"))))
    solo(e0, t0).foreach { case (it, gt) => assert(got((0L, it)) == gt,
      s"group 0 item $it drifted from the ungrouped tie-aware fit") }
    solo(e1, t1).foreach { case (it, gt) => assert(got((1L, it)) == gt,
      s"group 1 item $it drifted from the ungrouped tie-aware fit") }
    assert(got((1L, "a"))._2 == 1.0, "no-draw group pins theta to 1")
  }

  test("q_bt_drift: per-window ranks are permutations and lag links windows") {
    val out = graft.queries.TrainPrepQueries
      .qBtDrift(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val byW = out.groupBy(_.getAs[Long]("window_id"))
    assert(byW.size >= 2, "the month must split into multiple windows")
    byW.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length).toSeq, "ranks are a permutation per window")
    }
    // prev_rank chains each item's own window sequence: null first, then
    // the immediately preceding observation's rank; delta is their gap
    out.groupBy(_.getAs[String]("item")).foreach { case (it, rows) =>
      val seq = rows.sortBy(_.getAs[Long]("window_id"))
      assert(seq.head.isNullAt(6) && seq.head.isNullAt(7),
        s"$it: first window has no prev_rank")
      seq.sliding(2).filter(_.length == 2).foreach { case Array(p, c) =>
        assert(c.getAs[Long]("prev_rank") == p.getAs[Long]("rank"),
          s"$it: prev_rank must be the previous observation's rank")
        assert(c.getAs[Long]("rank_delta") ==
          p.getAs[Long]("rank") - c.getAs[Long]("rank"))
      }
    }
  }

  test("q_bt_drift_ci: intervals bracket ratings; sig_move iff intervals separate") {
    val out = graft.queries.TrainPrepQueries
      .qBtDriftCi(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("lo_q6") <= r.getAs[Long]("hi_q6"))
    }
    // sig_move replays the overlap test against the SAME item's previous
    // window; first observations are never significant
    val ci = out.map(r => ((r.getAs[Long]("window_id"),
      r.getAs[String]("item")),
      (r.getAs[Long]("lo_q6"), r.getAs[Long]("hi_q6")))).toMap
    out.groupBy(_.getAs[String]("item")).foreach { case (it, rows) =>
      val seq = rows.sortBy(_.getAs[Long]("window_id"))
      assert(!seq.head.getAs[Boolean]("sig_move"),
        s"$it: first window cannot be a significant move")
      // sig_move is computed on RAW doubles; the quantized view can only
      // check implications (floor preserves strict > one way, weak >= the
      // other), which still pins both false-positive directions
      seq.sliding(2).filter(_.length == 2).foreach { case Array(p, c) =>
        val (plo, phi) = ci((p.getAs[Long]("window_id"), it))
        val (clo, chi) = ci((c.getAs[Long]("window_id"), it))
        val sig = c.getAs[Boolean]("sig_move")
        if (clo > phi || chi < plo)
          assert(sig, s"$it: quantized-separated intervals must flag sig_move")
        if (sig)
          assert(clo >= phi || chi <= plo,
            s"$it: sig_move requires at least quantized-boundary separation")
      }
    }
  }

  test("q_bt_ratings: ranks are a permutation and wins are bounded by comparisons") {
    val rows = graft.queries.TrainPrepQueries.qBtRatings(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to rows.length).toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_wins") <= r.getAs[Long]("n_comparisons"))
      assert(r.getAs[Long]("rating_q6") >= 0L)
    }
  }

  test("q_bt_calibration: probabilities are complementary and errors bounded") {
    val rows = graft.queries.TrainPrepQueries
      .qBtCalibration(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pred = r.getAs[Long]("pred_q6")
      val emp = r.getAs[Long]("emp_q6")
      val err = r.getAs[Long]("abs_err_q6")
      assert(pred >= 0L && pred <= 1000000L && emp >= 0L && emp <= 1000000L)
      assert(err <= 1000000L && r.getAs[Long]("n_total") >= 1L)
      assert(r.getAs[String]("item_a") < r.getAs[String]("item_b"))
    }
  }

  test("q_pref_cycles: hand-built rock-paper-scissors is found exactly once, canonical rotation") {
    // Directly exercise the net-direction + triangle join through the
    // same SQL the driver query compiles to, on a tiny tournament:
    // r>s 2-0, s>p 2-1, p>r 3-1 — one 3-cycle.
    val comp = Seq(
      ("rock", "scissors", 2L), ("scissors", "paper", 2L),
      ("paper", "scissors", 1L), ("paper", "rock", 3L), ("rock", "paper", 1L)
    ).toDF("winner", "loser", "n")
    comp.createOrReplaceTempView("graft_pref_comp_t")
    val out = spark.sql(
      """WITH sym AS (SELECT i, j, sum(n) AS n FROM (
        |  SELECT winner AS i, loser AS j, n FROM graft_pref_comp_t
        |  UNION ALL SELECT loser, winner, n FROM graft_pref_comp_t) GROUP BY 1, 2),
        |up AS (SELECT DISTINCT i AS a, j AS b FROM sym WHERE i < j),
        |pairs AS (SELECT up.a, up.b, coalesce(cf.n, 0) AS naw, coalesce(cb.n, 0) AS nbw
        | FROM up LEFT JOIN graft_pref_comp_t cf ON cf.winner = up.a AND cf.loser = up.b
        | LEFT JOIN graft_pref_comp_t cb ON cb.winner = up.b AND cb.loser = up.a),
        |dir AS (SELECT CASE WHEN naw > nbw THEN a ELSE b END AS w,
        |  CASE WHEN naw > nbw THEN b ELSE a END AS l FROM pairs WHERE naw <> nbw)
        |SELECT d1.w AS item_a, d2.w AS item_b, d3.w AS item_c
        |FROM dir d1 JOIN dir d2 ON d1.l = d2.w
        |JOIN dir d3 ON d2.l = d3.w AND d3.l = d1.w
        |WHERE d1.w < d2.w AND d1.w < d3.w""".stripMargin).collect()
    assert(out.length == 1)
    assert(out.head.toSeq == Seq("paper", "rock", "scissors"))
  }

  test("q_preftrain_e2e: gate bounded by pairs, tokens positive, run deterministic") {
    val out = graft.queries.TrainPrepQueries
      .qPreftrainE2e(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_consistent"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("checksum"))).sortBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (_, np, nc, nt, _) =>
      assert(np >= 1L && nc >= 0L && nc <= np, "consistency gate is a subset")
      assert(nt > 0L, "every pair carries chosen+rejected tokens")
    }
    val again = graft.queries.TrainPrepQueries
      .qPreftrainE2e(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_consistent"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("checksum"))).sortBy(_._1)
    assert(again.toSeq == out.toSeq, "order-sensitive checksums must replay")
  }

  test("driver queries are non-empty and margin-clean at sf0.001") {
    val p = graft.queries.TrainPrepQueries.qPrefPairs(spark, "/root/testdata/sf0.001")
    val rows = p.collect()
    assert(rows.length == 13) // hand-checked in DuckDB at threshold 200
    assert(rows.forall(_.getAs[Double]("margin") >= 200.0))
    val b = graft.queries.TrainPrepQueries.qBestofN(spark, "/root/testdata/sf0.001")
      .agg(sum("n_in_batch"), max("n_in_batch")).collect().head
    assert(b.getLong(0) == 1000L, "every event lands in exactly one batch")
    assert(b.getLong(1) <= 4L)
  }
}
