package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded edit-distance (Levenshtein) similarity joins.
  *
  * The scale path is the PassJoin pigeonhole filter (Li/Deng/Feng,
  * "PASS-JOIN: a partition-based method for similarity joins", PVLDB 2011,
  * public): partition every indexed string of length L into τ+1 disjoint
  * segments — if ed(a, b) ≤ τ, then a must contain one of b's segments
  * verbatim (τ edits cannot touch all τ+1 segments), at a start position
  * within τ of the segment's home position. Candidate generation is
  * therefore a pure EQUALITY join on (target-length, segment-index,
  * substring): no quadratic pass, no similarity machinery — a shuffle
  * on short substring keys that AQE handles like any other join, followed
  * by an exact bounded `levenshtein` verify on the candidates only
  * (3-arg form: banded O(τ·n) DP, −1 when the distance exceeds τ).
  *
  * The reference has no string-similarity surface at all (its closest
  * analog is the per-row `Custom` escape hatch, transformations.py:72-77);
  * this is north-star extension surface for fuzzy dedup and fuzzy
  * record-linkage of OCR'd/scraped/typo'd corpora at 100 TB, where the
  * quadratic formulation (the DuckDB oracle, and
  * [[editDistancePairsBrute]]) is impossible by construction.
  *
  * Everything is codegen'd built-ins: `substring`/`sequence`/`explode`
  * for segment + probe enumeration, `levenshtein` for the verify.
  * Candidates are scored BEFORE the pair-dedup so the dedup exchange
  * carries (id, id, dist) and not the strings. */
object EditDistance {

  /** Disjoint even partition of a length-`len` string into m = τ+1
    * segments: the first m - (len mod m) segments have floor(len/m) chars,
    * the rest one more. Returns (start, segLen) columns (0-based start). */
  private def segmentGeometry(m: Int, len: Column, i: Column): (Column, Column) = {
    val q = len.divide(m).cast("int") // len, m ≥ 0 → truncation == floor
    val r = len % m
    val slen = q + when(i >= lit(m) - r, lit(1)).otherwise(lit(0))
    val start = i * q + greatest(i - (lit(m) - r), lit(0))
    (start, slen)
  }

  /** `sequence(from, to)` that is EMPTY (not descending) when from > to. */
  private def seqAsc(from: Column, to: Column): Column =
    when(from <= to, sequence(from, to))
      .otherwise(array().cast("array<int>"))

  /** Spread before the ~(2τ+1)²·(τ+1)-fold probe amplification: one
    * narrow (id, s) shuffle so the fan-out parallelizes even when the
    * source arrives in few partitions (measured 2.7x on the
    * single-row-group fixture). */
  private def spreadBase(df: DataFrame, strCol: String, idCol: String): DataFrame =
    graft.exec.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"),
        col(strCol).as("s"), length(col(strCol)).cast("int").as("len")))

  /** Index side: each string contributes its τ+1 home segments, keyed by
    * its own length (probes enumerate every candidate target length).
    * Output: (id_b, s_b, lt, i, seg). */
  private def indexSegments(base: DataFrame, tau: Int): DataFrame = {
    val m = tau + 1
    val (start, slen) = segmentGeometry(m, col("len"), col("i"))
    base
      .select(col("id"), col("s"), col("len"),
        explode(sequence(lit(0), lit(tau))).as("i"))
      .where(slen >= 1)
      .select(col("id").as("id_b"), col("s").as("s_b"),
        col("len").as("lt"), col("i"),
        col("s").substr(start + 1, slen).as("seg"))
  }

  /** Probe side: for every candidate target length within ±τ and every
    * segment index, all substrings of the probe string with that segment's
    * length whose start lies within τ of the segment's home position (a
    * superset of the multi-match-aware window — lossless, slightly more
    * candidates, same verified output). Output: (id_a, s_a, lt, i, seg). */
  private def probeSegments(base: DataFrame, tau: Int): DataFrame = {
    val m = tau + 1
    val lt = col("lt")
    val (start, slen) = segmentGeometry(m, lt, col("i"))
    base
      .select(col("id"), col("s"), col("len"),
        explode(seqAsc(greatest(col("len") - tau, lit(1)), col("len") + tau)).as("lt"))
      .select(col("id"), col("s"), col("len"), lt,
        explode(sequence(lit(0), lit(tau))).as("i"))
      .where(slen >= 1)
      // array_distinct before the explode: window positions often yield
      // the same substring (low-entropy text especially) and the join
      // key does not include the position — dedup is lossless and
      // map-side, and it shrinks the join's probe input directly.
      .select(col("id").as("id_a"), col("s").as("s_a"), lt, col("i"),
        explode(array_distinct(transform(
          seqAsc(greatest(start - tau, lit(0)),
            least(start + tau, col("len") - slen)),
          sp => col("s").substr(sp + lit(1), slen)))).as("seg"))
  }

  /** The pigeonhole argument needs τ+1 NONEMPTY segments: an index string
    * shorter than τ+1 has empty segments, which "match anywhere" — its
    * pairs can evade the segment equality join entirely (ed("aa","b")=2
    * shares no character at all; the empty string is the extreme case).
    * Pairs with such an index side are matched here exactly instead.
    * Both sides of such a pair are ≤ 2τ chars (ed ≥ length difference),
    * so this is a bounded cross join of two tiny-length subsets that
    * AQE broadcasts. Output: (id_a, id_b, dist). */
  private def shortStringPairs(probeBase: DataFrame, indexBase: DataFrame,
                               tau: Int): DataFrame =
    probeBase.where(col("len") <= 2 * tau)
      .select(col("id").as("id_a"), col("s").as("s_a"))
      .crossJoin(indexBase.where(col("len") <= tau)
        .select(col("id").as("id_b"), col("s").as("s_b")))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b"), tau).as("dist"))
      .where(col("dist") >= 0 && col("dist") <= tau)

  /** All pairs (id1 < id2) with levenshtein(s1, s2) ≤ tau.
    * Output: (id1, id2, dist: INT), each unordered pair once. */
  def editDistancePairs(df: DataFrame, strCol: String, idCol: String,
                        tau: Int): DataFrame = {
    require(tau >= 1, "tau must be ≥ 1")
    val base = spreadBase(df, strCol, idCol)
    probeSegments(base, tau).join(indexSegments(base, tau), Seq("lt", "i", "seg"))
      .where(col("id_a") =!= col("id_b"))
      // Verify before dedup: the dedup exchange then carries (id, id, dist)
      // instead of two strings per surviving candidate.
      .select(least(col("id_a"), col("id_b")).as("id1"),
        greatest(col("id_a"), col("id_b")).as("id2"),
        levenshtein(col("s_a"), col("s_b"), tau).as("dist"))
      .where(col("dist") >= 0 && col("dist") <= tau)
      .unionByName(shortStringPairs(base, base, tau)
        .where(col("id_a") =!= col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("id1"),
          greatest(col("id_a"), col("id_b")).as("id2"), col("dist")))
      .dropDuplicates("id1", "id2")
  }

  /** Fuzzy record linkage: every (probe, index) pair across TWO tables
    * with levenshtein ≤ tau — same pigeonhole candidate join, the index
    * table segmented, the probe table enumerated. Output:
    * (probe_id, index_id, dist: INT), each pair once. */
  def editDistanceJoin(probe: DataFrame, probeStr: String, probeId: String,
                       index: DataFrame, indexStr: String, indexId: String,
                       tau: Int): DataFrame = {
    require(tau >= 1, "tau must be ≥ 1")
    val pBase = spreadBase(probe, probeStr, probeId)
    val iBase = spreadBase(index, indexStr, indexId)
    probeSegments(pBase, tau)
      .join(indexSegments(iBase, tau), Seq("lt", "i", "seg"))
      .select(col("id_a").as("probe_id"), col("id_b").as("index_id"),
        levenshtein(col("s_a"), col("s_b"), tau).as("dist"))
      .where(col("dist") >= 0 && col("dist") <= tau)
      .unionByName(shortStringPairs(pBase, iBase, tau)
        .select(col("id_a").as("probe_id"), col("id_b").as("index_id"),
          col("dist")))
      .dropDuplicates("probe_id", "index_id")
  }

  /** Diagnostic: the number of (probe, index) candidate rows the pigeonhole
    * join emits BEFORE the bounded-levenshtein verify — the quantity that
    * actually drives [[editDistancePairs]]'s cost, for scale-slope audits
    * (each candidate costs one banded O(tau*n) verify). Not a query path. */
  def candidateCount(df: DataFrame, strCol: String, idCol: String,
                     tau: Int): Long = {
    val base = spreadBase(df, strCol, idCol)
    probeSegments(base, tau).join(indexSegments(base, tau), Seq("lt", "i", "seg"))
      .where(col("id_a") =!= col("id_b"))
      .count()
  }

  /** Quadratic twin (cross join + filter) — the correctness oracle for
    * tests; never the scale path. */
  def editDistancePairsBrute(df: DataFrame, strCol: String, idCol: String,
                             tau: Int): DataFrame = {
    val a = df.select(col(idCol).cast("long").as("id1"), col(strCol).as("s1"))
    val b = df.select(col(idCol).cast("long").as("id2"), col(strCol).as("s2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), levenshtein(col("s1"), col("s2")).as("dist"))
      .where(col("dist") <= tau)
  }

  /** Quadratic twin of [[editDistanceJoin]] for tests. */
  def editDistanceJoinBrute(probe: DataFrame, probeStr: String, probeId: String,
                            index: DataFrame, indexStr: String, indexId: String,
                            tau: Int): DataFrame = {
    val a = probe.select(col(probeId).cast("long").as("probe_id"),
      col(probeStr).as("s1"))
    val b = index.select(col(indexId).cast("long").as("index_id"),
      col(indexStr).as("s2"))
    a.crossJoin(b)
      .select(col("probe_id"), col("index_id"),
        levenshtein(col("s1"), col("s2")).as("dist"))
      .where(col("dist") <= tau)
  }
}
