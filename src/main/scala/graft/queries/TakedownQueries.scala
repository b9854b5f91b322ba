package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{ChunkIndex, ClusterIndex, DedupIndex, PreferenceIndex, SimilarityIndex, SpanIndex}

/** q_takedown_e2e — the END-TO-END TAKEDOWN CAPSTONE: one GDPR-style
  * deletion-request set, arriving AS A STREAM, withdrawn from ALL SIX
  * standing structures at once, partially compacted, and partially
  * re-admitted — the complete lifecycle a production training-data
  * pipeline owes a right-to-erasure request, composed from the pieces
  * each q_stream_*_readmit proof verified in isolation:
  *
  *  1. build the six standing structures from the fixtures: the dedup
  *     corpus index ([[DedupIndex]]), the incremental cluster state fed
  *     by one ingestion batch's verified edges ([[ClusterIndex]] via
  *     [[DedupIndex.matchEdges]] — the production edge source), the ANN
  *     index over the corpus embeddings ([[SimilarityIndex]]), the CDC
  *     chunk manifest ([[ChunkIndex]]), the span-dedup window store
  *     ([[SpanIndex]]), and a preference arena whose items are document
  *     ids ([[PreferenceIndex]] — judgments pair each corpus document
  *     against its successor in (lang, doc_id) order, longer text wins,
  *     equal length draws);
  *  2. the TAKEDOWN: a fixed-count request set (the 40 smallest corpus
  *     ids with doc_id % 3 = 1 — request-driven, not corpus-
  *     proportional) lands as a parquet file read through
  *     `readStream → foreachBatch`, and ONE batch function withdraws it
  *     from all six structures (dedup tombstones, cluster edge
  *     retraction + touched-component relabel, ANN tombstones, chunk
  *     tombstones + dirty-chunk recompute, span count subtraction,
  *     preference tombstones);
  *  3. compaction retires every structure's tombstones — dedup and ANN
  *     through [[DedupIndex.compactAuto]]/[[SimilarityIndex.compactAuto]]
  *     (the measured full-vs-partial dispatch choosing per layout),
  *     preference through the history-preserving partial retirement,
  *     cluster/chunk/span through their consolidating folds — the
  *     re-admission precondition everywhere (delete wins until then);
  *  4. the PERMITTED half (even doc ids) re-enters each structure as
  *     ordinary new data: re-judged against the post-compact dedup
  *     corpus (their fresh edges folding into the cluster state,
  *     possibly re-bridging what the withdrawal split), re-appended to
  *     ANN/chunk, span-trimmed against the post-takedown window store
  *     then appended, and their judgments re-appended as a late batch
  *     (rows touching a still-withdrawn odd id stay out).
  *
  * Output: ONE normalized frame, (structure, k, v) strings — the
  * re-admission verdicts (dedup), the live membership (cluster), the
  * post-takedown top-k of a fixed probe set (ann), the live chunk
  * manifest (chunk), the re-admission trims (span), the live win/tie
  * matrices (pref), and the ERASURE-SLO WATERMARKS (slo): the
  * per-structure durability/lag frame read TWICE from the real
  * capstone state — after the withdrawal (tombstones outstanding
  * everywhere) and after the compactions (durable everywhere) — so
  * the "is erasure durable, and how long has it been pending"
  * answers are proven against the very structures the takedown
  * mutated, not a parallel fixture (this folds the former standalone
  * q_takedown_slo in, r15 verdict ask #1, and retires its duplicate
  * six-structure build). The oracle replays the ENTIRE ledger in
  * closed form — batch edge discovery, edge subtraction, re-admission
  * edges against the post-compact corpus, manifest/window/judgment
  * replays, watermark predictions — as a UNION ALL of seven
  * independently-derived sections, so one hash-pass proves the whole
  * takedown story end to end: every structure forgot exactly the
  * withdrawn documents, kept everything else bit-for-bit, re-admitted
  * exactly the permitted subset, and REPORTED its erasure status
  * truthfully at both lifecycle points. */
object TakedownQueries {

  private val CutMod = TrainPrepQueries.CdcCutMod

  /** Wall-clock per capstone phase to stderr — the cost attribution the
    * bench's #1 entry owes its reader (six serial withdraw/compact/
    * readmit legs; which leg is the money?). Same convention as
    * compactPartial's phase prints. */
  private def phase[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    System.err.println(
      f"[takedown] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    r
  }

  def qTakedownE2e(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val base = Scratch.fresh(s, "takedown", dir)
    val docs = Tables(s, dir, "documents")
      .select("doc_id", "lang", "text", "n_chars")
    val e = Tables(s, dir, "embeddings")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val td = corpus.filter(col("doc_id") % 3 === 1)
      .orderBy("doc_id").limit(40).select("doc_id").localCheckpoint()
    val tdEven = td.filter(col("doc_id") % 2 === 0)
    val tdOdd = td.filter(col("doc_id") % 2 === 1)
    val dedupIdx = "graft_idx_tde_dedup"
    val annIdx = "graft_idx_tde_ann"
    val spanIdx = "graft_idx_tde_span"
    val cc = s"$base/cc"
    val chunkB = s"$base/chunks"
    val prefB = s"$base/pref"

    // judgments: each corpus doc vs its successor in (lang, doc_id)
    // order; longer text wins, equal draws — items are doc-id strings
    val byLang = Window.partitionBy("lang").orderBy("doc_id")
    val judgments = corpus
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("nb_id", lead("doc_id", 1).over(byLang))
      .withColumn("nb_chars", lead("n_chars", 1).over(byLang))
      .filter(col("nb_id").isNotNull)
      .select(col("doc_id").as("ia_id"), col("nb_id").as("ib_id"),
        col("doc_id").cast("string").as("ia"),
        col("nb_id").cast("string").as("ib"),
        when(col("n_chars") > col("nb_chars"), "a")
          .when(col("n_chars") < col("nb_chars"), "b")
          .otherwise("tie").as("oc"))
      .localCheckpoint()

    // ---- 1. build all six standing structures
    phase("build_dedup")(DedupIndex.write(corpus, "text", "doc_id", "lang",
      dedupIdx, threshold = 0.5))
    val b0 = docs.filter(col("doc_id") % 10 === 0)
    phase("build_cluster") {
      val ep0 = DedupIndex.snapshotEpoch(s, dedupIdx)
      val edges0 = DedupIndex.matchEdges(s, dedupIdx, b0,
        "text", "doc_id", "lang", threshold = 0.5).localCheckpoint()
      try {
        ClusterIndex.fold(s, cc, edges0, b0.select(col("doc_id")),
          ClusterIndex.streamFoldId(0L))
        // healRefresh = false: matchEdges healed WITH refresh at the top
        // of this leg; the probe-time epoch makes the single-writer
        // assumption CHECKED (the IngestDedup discipline applied to the
        // direct-call path)
        DedupIndex.appendKept(s, dedupIdx, b0,
          DedupIndex.verdictsFromEdges(b0, "doc_id", edges0),
          "text", "doc_id", "lang", threshold = 0.5, batchId = 0L,
          healRefresh = false, expectEpoch = Some(ep0))
      } finally graft.exec.Partitioning.unpersistCheckpoint(edges0)
    }
    phase("build_ann")(SimilarityIndex.write(e.filter(col("vec_id") % 5 =!= 0),
      "embedding", "vec_id", annIdx, k = 4, iters = 1, buckets = 4))
    phase("build_chunk")(ChunkIndex.append(s, chunkB, corpus, "text", "doc_id",
      seed = 42L, cutMod = CutMod, batchId = 0L))
    phase("build_span")(SpanIndex.write(corpus, "text", "doc_id", spanIdx,
      w = 6, buckets = 8))
    phase("build_pref")(PreferenceIndex.appendJudgments(s, prefB, judgments,
      "ia", "ib", "oc", batchId = 0L))

    // ---- 2. the takedown REQUEST STREAM: one foreachBatch withdraws
    // the ids from all six standing structures
    val reqDir = s"$base/requests"
    td.coalesce(1).write.mode("overwrite").parquet(reqDir)
    val q = s.readStream.schema(td.schema).parquet(reqDir).writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (req: DataFrame, _: Long) =>
        val ids = req.localCheckpoint() // request-driven: delta-sized
        try {
          phase("wd_dedup")(DedupIndex.delete(s, dedupIdx, ids, "doc_id"))
          phase("wd_cluster")(ClusterIndex.withdraw(s, cc, ids,
            ClusterIndex.nextBatchId(s, cc)))
          phase("wd_ann")(SimilarityIndex.delete(s, annIdx, ids, "doc_id"))
          phase("wd_chunk")(ChunkIndex.delete(s, chunkB, ids, "doc_id",
            cutMod = CutMod, batchId = 1L))
          phase("wd_span")(SpanIndex.delete(s, spanIdx,
            docs.join(ids, "doc_id"), "text", "doc_id", bid = 1L))
          phase("wd_pref")(PreferenceIndex.withdraw(s, prefB,
            ids.select(col("doc_id").cast("string").as("item")), "item",
            batchId = 1L))
        } finally graft.exec.Partitioning.unpersistCheckpoint(ids)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // ---- SLO snapshot #1 (erasure NOT yet durable): the watermark
    // frame read from the REAL capstone state right after the
    // withdrawal — every structure must report its outstanding
    // tombstones (and zero batch lag: the withdrawal IS the newest
    // batch everywhere)
    val sloPending = phase("slo_pending")(sloSnapshot(s, "pending",
      dedupIdx, annIdx, cc, chunkB, spanIdx, prefB))

    // ---- 3. compactions retire every structure's tombstones — the
    // re-admission precondition (delete wins until here)
    phase("cp_dedup")(DedupIndex.compactAuto(s, dedupIdx))
    phase("cp_ann")(SimilarityIndex.compactAuto(s, annIdx))
    phase("cp_cluster")(ClusterIndex.compact(s, cc))
    val chunkC = phase("cp_chunk")(ChunkIndex.compact(s, chunkB,
      cutMod = CutMod))
    phase("cp_span")(SpanIndex.compact(s, spanIdx))
    phase("cp_pref")(PreferenceIndex.compactBatched(s, prefB))

    // ---- SLO snapshot #2 (erasure DURABLE): the same frame after the
    // compactions, BEFORE re-admission — every structure must now
    // report durable = 1 with zero outstanding, proving the watermarks
    // track the actual physical retirement the compactions performed
    val sloDurable = phase("slo_durable")(sloSnapshot(s, "durable",
      dedupIdx, annIdx, cc, chunkB, spanIdx, prefB))

    // ---- 4. the permitted (even) half re-enters as ordinary new data
    val b2 = docs.join(tdEven, "doc_id")
    val ep2 = DedupIndex.snapshotEpoch(s, dedupIdx)
    val edges2 = phase("re_probe")(DedupIndex.matchEdges(s, dedupIdx, b2,
      "text", "doc_id", "lang", threshold = 0.5).localCheckpoint())
    val verd2 = DedupIndex
      .verdictsFromEdges(b2, "doc_id", edges2).localCheckpoint()
    try {
      phase("re_cluster")(ClusterIndex.fold(s, cc, edges2,
        b2.select(col("doc_id")), ClusterIndex.streamFoldId(2L)))
      phase("re_dedup")(DedupIndex.appendKept(s, dedupIdx, b2, verd2,
        "text", "doc_id", "lang", threshold = 0.5, batchId = 2L,
        healRefresh = false, expectEpoch = Some(ep2)))
    } finally graft.exec.Partitioning.unpersistCheckpoint(edges2)
    phase("re_ann")(SimilarityIndex.append(s, annIdx,
      e.join(tdEven, e("vec_id") === tdEven("doc_id"))
        .select(e("vec_id"), e("embedding"))))
    phase("re_chunk")(ChunkIndex.append(s, chunkB, b2, "text", "doc_id",
      seed = 42L, cutMod = CutMod, batchId = chunkC + 1L))
    val trimmed2 = phase("re_span") {
      val t = SpanIndex.trimIncremental(s, spanIdx, b2,
        "text", "doc_id").localCheckpoint()
      SpanIndex.append(s, spanIdx, t, "trimmed_text", "doc_id", bid = 2L)
      t
    }
    val late = judgments
      .join(tdEven.select(col("doc_id").as("ia_id")), Seq("ia_id"), "left_semi")
      .unionByName(judgments.join(
        tdEven.select(col("doc_id").as("ib_id")), Seq("ib_id"), "left_semi")
        .select(judgments.columns.map(col).toSeq: _*))
      .dropDuplicates("ia_id", "ib_id")
      .join(tdOdd.select(col("doc_id").as("ia_id")), Seq("ia_id"), "left_anti")
      .join(tdOdd.select(col("doc_id").as("ib_id")), Seq("ib_id"), "left_anti")
    PreferenceIndex.appendJudgments(s, prefB, late,
      "ia", "ib", "oc", batchId = 2L)

    // ---- 5. one normalized observable per structure
    def norm(structure: String, k: org.apache.spark.sql.Column,
             v: org.apache.spark.sql.Column)(df: DataFrame): DataFrame =
      df.select(lit(structure).as("structure"),
        k.cast("string").as("k"), v.as("v"))
    val dedupOut = norm("dedup", col("doc_id"),
      concat(col("keep").cast("string"), lit(":"),
        coalesce(col("reason"), lit(""))))(verd2)
    val clusterOut = norm("cluster", col("id"), col("cid").cast("string"))(
      ClusterIndex.current(s, cc))
    val annOut = norm("ann", col("query_id"),
      concat(col("rank").cast("string"), lit(":"),
        col("cand_id").cast("string")))(
      SimilarityIndex.topK(s, annIdx, e.filter(col("vec_id") < 10),
        k = 5, nprobe = 2))
    val chunkOut = norm("chunk", col("chunk_key"),
      concat(col("n_docs").cast("string"), lit(":"),
        col("n_tokens").cast("string"), lit(":"),
        col("checksum").cast("string")))(
      ChunkIndex.readManifest(s, chunkB))
    val spanOut = norm("span", col("doc_id"),
      concat(col("kept_tokens").cast("string"), lit(":"),
        col("trimmed_text")))(trimmed2)
    val prefWins = norm("pref",
      concat(lit("w:"), col("winner"), lit("|"), col("loser")),
      col("n").cast("string"))(PreferenceIndex.matrix(s, prefB))
    val prefTies = norm("pref",
      concat(lit("t:"), col("a"), lit("|"), col("b")),
      col("n").cast("string"))(PreferenceIndex.ties(s, prefB))
    import s.implicits._
    val sloOut = (sloPending ++ sloDurable)
      .toDF("structure", "k", "value")
      .select(col("structure"), col("k"), col("value").cast("string").as("v"))
    Seq(dedupOut, clusterOut, annOut, chunkOut, spanOut, prefWins, prefTies,
      sloOut).reduce(_.unionByName(_))
  }

  /** One erasure-status snapshot of all six standing structures, read
    * from each one's cheap observability surface (tombstone tables,
    * delta-partition listings, sidecar/marker state — never a corpus
    * scan): outstanding tombstones, the derived `erasure_durable` flag,
    * and — for the batch-versioned chains (cluster/chunk/pref) — the
    * BATCH LAG: delta batches landed since the oldest outstanding
    * tombstone, the "how long has this takedown been waiting" a
    * production erasure SLO alerts on. Dedup/ANN tombstones are
    * EPOCH-stamped, not batch-stamped (a pending tombstone is by
    * definition aimed at the live snapshot), and the span store's batch
    * clock lives in a corpus-table column — so those three report
    * counts without a lag row rather than pay a corpus scan for one.
    * Returned as (structure="slo", "<tag>:<structure>:<metric>", value)
    * rows folded into the capstone's output frame, so the oracle
    * hash-verifies the durability answers against the REAL
    * post-withdrawal / post-compaction state. */
  private def sloSnapshot(s: SparkSession, tag: String, dedupIdx: String,
                          annIdx: String, cc: String, chunkB: String,
                          spanIdx: String, prefB: String)
      : Seq[(String, String, Long)] = {
    def durable(n: Long): Long = if (n == 0L) 1L else 0L
    val dp = DedupIndex.pendingTombstones(s, dedupIdx)
    val ap = SimilarityIndex.pendingTombstones(s, annIdx)
    val rl = ClusterIndex.retractedLive(s, cc)
    val cp = ChunkIndex.pendingTombstones(s, chunkB)
    val sp = SpanIndex.pendingTombstoneRows(s, spanIdx)
    val pp = PreferenceIndex.pendingTombstones(s, prefB)
    Seq(
      (s"$tag:dedup:tombs_outstanding", dp),
      (s"$tag:dedup:erasure_durable", durable(dp)),
      (s"$tag:ann:tombs_outstanding", ap),
      (s"$tag:ann:erasure_durable", durable(ap)),
      (s"$tag:cluster:retracted_live", rl),
      (s"$tag:cluster:pending_batches", ClusterIndex.pendingBatches(s, cc)),
      (s"$tag:cluster:batch_lag", ClusterIndex.tombBatchLag(s, cc)),
      (s"$tag:cluster:erasure_durable", durable(rl)),
      (s"$tag:chunk:tombs_outstanding", cp),
      (s"$tag:chunk:manifest_versions", ChunkIndex.manifestVersions(s, chunkB)),
      (s"$tag:chunk:batch_lag", ChunkIndex.tombBatchLag(s, chunkB)),
      (s"$tag:chunk:erasure_durable", durable(cp)),
      (s"$tag:span:tombstone_rows", sp),
      (s"$tag:span:erasure_durable", durable(sp)),
      (s"$tag:pref:tombs_outstanding", pp),
      (s"$tag:pref:batch_lag", PreferenceIndex.tombBatchLag(s, prefB)),
      (s"$tag:pref:erasure_durable", durable(pp)))
      .map { case (k, v) => ("slo", k, v) }
  }

  // ------------------------------------------------------------- oracle

  private val TdAll =
    "(SELECT doc_id FROM documents WHERE doc_id % 5 <> 0 AND " +
      "doc_id % 3 = 1 ORDER BY doc_id LIMIT 40)"
  private val TdEven =
    s"(SELECT doc_id FROM $TdAll __te WHERE doc_id % 2 = 0)"
  private val TdOdd =
    s"(SELECT doc_id FROM $TdAll __to WHERE doc_id % 2 = 1)"

  /** Shingle + batch-0 edge + live-corpus CTE block shared (textually)
    * by the dedup and cluster sections — each section is its own
    * subquery with its own WITH, so no CTE names collide across
    * sections. */
  private val SharedDedupCtes =
    s"""w AS (SELECT doc_id, lang, text,
       |  string_split_regex(lower(trim(text)), '[ \\t\\n\\f\\r]+') AS w FROM documents),
       |sh AS (SELECT doc_id, lang, text,
       |  list_distinct(list_transform(range(0, greatest(len(w) - 3, 0) + 1),
       |    i -> array_to_string(w[i+1:i+3], ' '))) AS t FROM w),
       |corpus0 AS (SELECT * FROM sh WHERE doc_id % 5 <> 0),
       |d0 AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
       |e0 AS (
       |  SELECT c.doc_id AS a, d.doc_id AS b FROM d0 d
       |    JOIN corpus0 c ON d.text = c.text
       |  UNION
       |  SELECT c.doc_id AS a, d.doc_id AS b FROM d0 d
       |    JOIN corpus0 c ON d.lang = c.lang
       |  WHERE len(list_intersect(d.t, c.t))::DOUBLE
       |      / (len(d.t) + len(c.t) - len(list_intersect(d.t, c.t))) >= 0.5),
       |v0keep AS (SELECT doc_id FROM d0
       |  WHERE doc_id NOT IN (SELECT b FROM e0)),
       |live AS (
       |  SELECT * FROM corpus0
       |  WHERE doc_id NOT IN (SELECT doc_id FROM $TdAll __t)
       |  UNION ALL
       |  SELECT sh.* FROM sh JOIN v0keep k ON sh.doc_id = k.doc_id),
       |d2 AS (SELECT * FROM sh
       |  WHERE doc_id IN (SELECT doc_id FROM $TdEven)),
       |e2 AS (
       |  SELECT c.doc_id AS a, d.doc_id AS b FROM d2 d
       |    JOIN live c ON d.text = c.text
       |  UNION
       |  SELECT c.doc_id AS a, d.doc_id AS b FROM d2 d
       |    JOIN live c ON d.lang = c.lang
       |  WHERE len(list_intersect(d.t, c.t))::DOUBLE
       |      / (len(d.t) + len(c.t) - len(list_intersect(d.t, c.t))) >= 0.5)""".stripMargin

  private val DedupSection =
    s"""(WITH $SharedDedupCtes,
       |e2x AS (SELECT DISTINCT d.doc_id FROM d2 d
       |  JOIN live c ON d.text = c.text),
       |e2n AS (SELECT DISTINCT d.doc_id FROM d2 d
       |  JOIN live c ON d.lang = c.lang
       |  WHERE len(list_intersect(d.t, c.t))::DOUBLE
       |      / (len(d.t) + len(c.t) - len(list_intersect(d.t, c.t))) >= 0.5)
       |SELECT 'dedup' AS structure, CAST(d2.doc_id AS VARCHAR) AS k,
       |  concat(CASE WHEN x.doc_id IS NULL AND n.doc_id IS NULL
       |    THEN 'true' ELSE 'false' END, ':',
       |    CASE WHEN x.doc_id IS NOT NULL THEN 'exact'
       |         WHEN n.doc_id IS NOT NULL THEN 'near' ELSE '' END) AS v
       |FROM d2 LEFT JOIN e2x x ON d2.doc_id = x.doc_id
       |  LEFT JOIN e2n n ON d2.doc_id = n.doc_id)""".stripMargin

  private val ClusterSection =
    s"""(WITH RECURSIVE $SharedDedupCtes,
       |nodes0 AS (SELECT doc_id AS id FROM d0
       |  UNION SELECT a FROM e0 UNION SELECT b FROM e0),
       |wno AS (SELECT id FROM nodes0
       |  WHERE id IN (SELECT doc_id FROM $TdAll __w)),
       |e0s AS (SELECT a, b FROM e0
       |  WHERE a NOT IN (SELECT id FROM wno)
       |    AND b NOT IN (SELECT id FROM wno)),
       |nodes AS (SELECT id FROM nodes0
       |    WHERE id NOT IN (SELECT id FROM wno)
       |  UNION SELECT doc_id FROM d2
       |  UNION SELECT a FROM e2 UNION SELECT b FROM e2),
       |alle AS (SELECT a, b FROM e0s UNION SELECT a, b FROM e2),
       |edges AS (SELECT a AS u, b AS v FROM alle
       |  UNION SELECT b AS u, a AS v FROM alle),
       |reach AS (
       |  SELECT id AS s, id AS r FROM nodes
       |  UNION
       |  SELECT re.s, ed.v FROM reach re JOIN edges ed ON re.r = ed.u)
       |SELECT 'cluster' AS structure, CAST(s AS VARCHAR) AS k,
       |  CAST(min(r) AS VARCHAR) AS v FROM reach GROUP BY s)""".stripMargin

  private def annSection: String = {
    val ivf = MiningQueries.ivfOracleSql(
      trainPred = "vec_id % 5 <> 0",
      corpusPred = "e.vec_id % 5 <> 0 AND " +
        s"e.vec_id NOT IN (SELECT doc_id FROM $TdOdd)")
    s"""(SELECT 'ann' AS structure, CAST(query_id AS VARCHAR) AS k,
       |  concat(CAST(rank AS VARCHAR), ':', CAST(cand_id AS VARCHAR)) AS v
       |FROM ($ivf) __ann)""".stripMargin
  }

  private def chunkSection: String = {
    val manifest = TrainPrepQueries.cdcManifestSql(
      "SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0 AND " +
        s"doc_id NOT IN (SELECT doc_id FROM $TdOdd)")
    s"""(SELECT 'chunk' AS structure, CAST(chunk_key AS VARCHAR) AS k,
       |  concat(CAST(n_docs AS VARCHAR), ':', CAST(n_tokens AS VARCHAR),
       |    ':', CAST(checksum AS VARCHAR)) AS v
       |FROM ($manifest) __ch)""".stripMargin
  }

  private def spanSection: String =
    s"""(WITH tc AS (SELECT string_split_regex(lower(trim(text)), '[ \\t\\n\\f\\r]+') AS toks
       |  FROM documents WHERE doc_id % 5 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM $TdAll __t)),
       |pc AS (SELECT toks,
       |  unnest(range(1, greatest(len(toks) - 5, 1) + 1)) AS pos FROM tc),
       |ref2 AS (SELECT DISTINCT array_to_string(toks[pos:pos+5], ' ') AS win
       |  FROM pc),
       |dd2 AS (SELECT doc_id, text FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM $TdEven)),
       |${ExtQueries.spanTrimCtes("2", "dd2", "ref2")}
       |SELECT 'span' AS structure, CAST(doc_id AS VARCHAR) AS k,
       |  concat(CAST(kept_tokens AS VARCHAR), ':', trimmed_text) AS v
       |FROM out2)""".stripMargin

  private val PrefSection =
    s"""(WITH c AS (SELECT doc_id, lang, n_chars FROM documents
       |  WHERE doc_id % 5 <> 0),
       |pr AS (SELECT doc_id AS ia_id, n_chars,
       |  lead(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS ib_id,
       |  lead(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS nbc
       |  FROM c),
       |j AS (SELECT ia_id, ib_id,
       |  CASE WHEN n_chars > nbc THEN 'a' WHEN n_chars < nbc THEN 'b'
       |       ELSE 'tie' END AS oc
       |  FROM pr WHERE ib_id IS NOT NULL),
       |live0 AS (SELECT * FROM j
       |  WHERE ia_id NOT IN (SELECT doc_id FROM $TdAll __a)
       |    AND ib_id NOT IN (SELECT doc_id FROM $TdAll __b)),
       |late AS (SELECT * FROM j
       |  WHERE (ia_id IN (SELECT doc_id FROM $TdEven)
       |      OR ib_id IN (SELECT doc_id FROM $TdEven))
       |    AND ia_id NOT IN (SELECT doc_id FROM $TdOdd)
       |    AND ib_id NOT IN (SELECT doc_id FROM $TdOdd)),
       |allj AS (SELECT * FROM live0 UNION ALL SELECT * FROM late),
       |wins AS (SELECT
       |    CAST(CASE WHEN oc = 'a' THEN ia_id ELSE ib_id END AS VARCHAR)
       |      AS winner,
       |    CAST(CASE WHEN oc = 'a' THEN ib_id ELSE ia_id END AS VARCHAR)
       |      AS loser
       |  FROM allj WHERE oc <> 'tie'),
       |tiesj AS (SELECT
       |    least(CAST(ia_id AS VARCHAR), CAST(ib_id AS VARCHAR)) AS ta,
       |    greatest(CAST(ia_id AS VARCHAR), CAST(ib_id AS VARCHAR)) AS tb
       |  FROM allj WHERE oc = 'tie')
       |SELECT 'pref' AS structure, concat('w:', winner, '|', loser) AS k,
       |  CAST(count(*) AS VARCHAR) AS v FROM wins GROUP BY winner, loser
       |UNION ALL
       |SELECT 'pref', concat('t:', ta, '|', tb),
       |  CAST(count(*) AS VARCHAR) FROM tiesj GROUP BY ta, tb)""".stripMargin

  /** Closed-form prediction of BOTH watermark snapshots from the
    * fixture alone — the former standalone q_takedown_slo's oracle,
    * re-derived for the REAL capstone state (r15 verdict ask #1: the
    * SLO frame now proves durability against the structures the
    * takedown actually mutated, not a parallel build). Pending
    * snapshot: every per-request count is |td| (the three
    * tombstone-table deletes write the request set verbatim), the
    * cluster sentinels are |td ∩ tracked nodes| (batch-0 docs ∪ their
    * matched corpus partners — the e0 edge relation), and the span
    * negatives are the pooled distinct 6-token windows of the
    * withdrawn docs. Batch lags are 0 on both sides: the withdrawal is
    * the NEWEST batch everywhere at snapshot #1 (nothing has landed
    * since the oldest tombstone), and nothing is outstanding at
    * snapshot #2 — the discriminating lag arithmetic (appends landing
    * AFTER a withdrawal) is pinned in ExtSpec, where the interleaving
    * can be driven directly. Durable snapshot: all zeros/ones plus the
    * post-compaction invariants (one members delta batch, one manifest
    * version). */
  private val SloSection =
    s"""(WITH $SharedDedupCtes,
       |nodes0 AS (SELECT doc_id AS id FROM d0
       |  UNION SELECT a FROM e0 UNION SELECT b FROM e0),
       |rl AS (SELECT count(*) AS n FROM $TdAll __r
       |  WHERE doc_id IN (SELECT id FROM nodes0)),
       |nreq AS (SELECT count(*) AS n FROM $TdAll __n),
       |twd AS (SELECT string_split_regex(lower(trim(text)), '[ \\t\\n\\f\\r]+') AS toks
       |  FROM documents WHERE doc_id IN (SELECT doc_id FROM $TdAll __t2)),
       |pwd AS (SELECT toks,
       |  unnest(range(1, greatest(len(toks) - 5, 1) + 1)) AS pos FROM twd),
       |wnd AS (SELECT count(DISTINCT array_to_string(toks[pos:pos+5], ' ')) AS n
       |  FROM pwd)
       |SELECT 'slo' AS structure, k, v FROM (
       |  SELECT 'pending:dedup:tombs_outstanding' AS k,
       |    CAST((SELECT n FROM nreq) AS VARCHAR) AS v
       |  UNION ALL SELECT 'pending:dedup:erasure_durable',
       |    CASE WHEN (SELECT n FROM nreq) = 0 THEN '1' ELSE '0' END
       |  UNION ALL SELECT 'pending:ann:tombs_outstanding',
       |    CAST((SELECT n FROM nreq) AS VARCHAR)
       |  UNION ALL SELECT 'pending:ann:erasure_durable',
       |    CASE WHEN (SELECT n FROM nreq) = 0 THEN '1' ELSE '0' END
       |  UNION ALL SELECT 'pending:cluster:retracted_live',
       |    CAST((SELECT n FROM rl) AS VARCHAR)
       |  UNION ALL SELECT 'pending:cluster:pending_batches',
       |    CAST(1 + (CASE WHEN (SELECT n FROM rl) > 0 THEN 1 ELSE 0 END)
       |      AS VARCHAR)
       |  UNION ALL SELECT 'pending:cluster:batch_lag', '0'
       |  UNION ALL SELECT 'pending:cluster:erasure_durable',
       |    CASE WHEN (SELECT n FROM rl) = 0 THEN '1' ELSE '0' END
       |  UNION ALL SELECT 'pending:chunk:tombs_outstanding',
       |    CAST((SELECT n FROM nreq) AS VARCHAR)
       |  UNION ALL SELECT 'pending:chunk:manifest_versions', '2'
       |  UNION ALL SELECT 'pending:chunk:batch_lag', '0'
       |  UNION ALL SELECT 'pending:chunk:erasure_durable',
       |    CASE WHEN (SELECT n FROM nreq) = 0 THEN '1' ELSE '0' END
       |  UNION ALL SELECT 'pending:span:tombstone_rows',
       |    CAST((SELECT n FROM wnd) AS VARCHAR)
       |  UNION ALL SELECT 'pending:span:erasure_durable',
       |    CASE WHEN (SELECT n FROM wnd) = 0 THEN '1' ELSE '0' END
       |  UNION ALL SELECT 'pending:pref:tombs_outstanding',
       |    CAST((SELECT n FROM nreq) AS VARCHAR)
       |  UNION ALL SELECT 'pending:pref:batch_lag', '0'
       |  UNION ALL SELECT 'pending:pref:erasure_durable',
       |    CASE WHEN (SELECT n FROM nreq) = 0 THEN '1' ELSE '0' END
       |  UNION ALL SELECT 'durable:dedup:tombs_outstanding', '0'
       |  UNION ALL SELECT 'durable:dedup:erasure_durable', '1'
       |  UNION ALL SELECT 'durable:ann:tombs_outstanding', '0'
       |  UNION ALL SELECT 'durable:ann:erasure_durable', '1'
       |  UNION ALL SELECT 'durable:cluster:retracted_live', '0'
       |  UNION ALL SELECT 'durable:cluster:pending_batches', '1'
       |  UNION ALL SELECT 'durable:cluster:batch_lag', '0'
       |  UNION ALL SELECT 'durable:cluster:erasure_durable', '1'
       |  UNION ALL SELECT 'durable:chunk:tombs_outstanding', '0'
       |  UNION ALL SELECT 'durable:chunk:manifest_versions', '1'
       |  UNION ALL SELECT 'durable:chunk:batch_lag', '0'
       |  UNION ALL SELECT 'durable:chunk:erasure_durable', '1'
       |  UNION ALL SELECT 'durable:span:tombstone_rows', '0'
       |  UNION ALL SELECT 'durable:span:erasure_durable', '1'
       |  UNION ALL SELECT 'durable:pref:tombs_outstanding', '0'
       |  UNION ALL SELECT 'durable:pref:batch_lag', '0'
       |  UNION ALL SELECT 'durable:pref:erasure_durable', '1'
       |) __slorows)""".stripMargin

  def qTakedownE2eSql: String =
    Seq(DedupSection, ClusterSection, annSection, chunkSection,
      spanSection, PrefSection, SloSection)
      .map(sec => s"SELECT structure, k, v FROM $sec __s")
      .mkString("\nUNION ALL\n")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_takedown_e2e" -> (qTakedownE2e _))

  val oracle: Map[String, String] = Map(
    "q_takedown_e2e" -> qTakedownE2eSql)
}
