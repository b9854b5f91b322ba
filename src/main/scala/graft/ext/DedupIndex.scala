package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Standing dedup index as BUCKETED tables, so continuous (delta-vs-corpus)
  * ingestion never shuffles the corpus side again.
  *
  * [[Dedup.dedupIncremental]] recomputes corpus hashes/shingles and
  * exchanges them on every batch — fine for a one-shot backfill, wasted
  * work for the 100 TB steady state where the corpus is petabytes and the
  * delta is not. This module persists the corpus's dedup artifacts ONCE,
  * each bucketed on exactly its probe-join keys, so every per-batch join
  * reads bucket files already partitioned the way the join needs them
  * (`FileSourceScanExec` reports the bucket `HashPartitioning`, and
  * EnsureRequirements shuffles only the small delta side to match —
  * asserted in IOSpec):
  *
  *  - `<base>_exact(h, t, id)`  bucketed by `(h, t)`, h = xxhash64(text) —
  *    the exact-duplicate rule probes it with an equi-join on `h` plus the
  *    text equality (which Catalyst folds into the join keys, so the
  *    bucket spec carries BOTH keys; the leading 8-byte hash keeps bucket
  *    sort comparisons cheap); one row per HOLDER (id), so per-document
  *    deletion can retire a single holder's witness;
  *  - `<base>_pref(bk, id)`     bucketed by `bk` = xxhash64(block, prefix
  *    shingle hash) — PPJoin candidate generation is an equi-join on the
  *    fused key (a 64-bit collision can only ADD a candidate, which the
  *    exact verify then rejects — recall is unaffected);
  *  - `<base>_sh(id, blk, sh)`  bucketed by `id` — the verify join fetches
  *    each candidate's full sorted shingle-hash array by id;
  *  - `<base>_band(bk, id)`     bucketed by `bk` = the MinHash band hash —
  *    the LSH candidate generator (`candidates = "lsh"`), for corpora
  *    where the prefix explode is too wide (very long documents): ~b·n
  *    index rows regardless of document length, at the cost of LSH's
  *    probabilistic recall. Both generators feed the SAME exact-Jaccard
  *    verify, so precision is exact either way.
  *
  * Kept batches append to the same tables (`SaveMode.Append` preserves the
  * bucket spec), so the index *is* the corpus state and ingestion is:
  * judge batch → append survivors → next batch. Every row carries the
  * `bid` (batch id) it arrived in, and a probe can EXCLUDE its own batch
  * id — that makes a replayed micro-batch (restart after the append)
  * judge against exactly the pre-append state, so replay verdicts equal
  * the originals (tested in StreamSpec). */
object DedupIndex {

  def exactTable(base: String) = s"${base}_exact"
  def prefTable(base: String)  = s"${base}_pref"
  def shTable(base: String)    = s"${base}_sh"
  def bandTable(base: String)  = s"${base}_band"

  /** Pending deletions: one row per deleted doc id, stamped with the
    * exact table's snapshot EPOCH (dir name) it was aimed at — a
    * rebuild's commit changes the epoch, retiring surviving tombstones
    * atomically (no tombs+corpus two-table atomicity needed in either
    * direction). Tiny between compactions (DELTAS, never corpus rows),
    * so probes broadcast it. One table for all four corpus tables: the
    * exact table stores each holder's id precisely so that deletion can
    * be per-document (a (hash, text) tombstone would mask the shared
    * exact row for EVERY holder of a duplicated text). */
  def tombsTable(base: String) = s"${base}_tombs"

  /** MinHash/LSH banding parameters (k = bands·rows): 16 bands of 4 rows —
    * [[Dedup.minhashPairs]]' defaults; collision probability at the 0.5
    * Jaccard operating point ≈ 0.64 per pair and ≥ 0.99 by ~0.7. */
  val LshK = 64
  val LshBands = 16
  val LshSeed = 42L

  /** Advisory append-pressure sidecar on the anchor (exact) table:
    * payload `"<docs appended since last fold> <docs in the snapshot>"`.
    * [[write]] seeds `0 <n>`, each append folds its batch's doc count
    * in, [[compact]] re-bases to `0 <folded n>` — so [[needsCompact]]
    * can weigh accumulated append mass against the snapshot without
    * scanning anything. Same crash contract as the ANN occupancy
    * sidecar: a crash between an append's row commit and the sidecar
    * fold leaves it stale-low; missing on a legacy index (appends then
    * skip the fold and [[appendedSinceSnapshot]] reports unknown). */
  private val AppendedSidecar = "_appended"

  /** The per-document index artifacts for one frame: id, block, text hash,
    * text, and the hash-sorted shingle array ([[Dedup.prefixJaccardPairs]]'
    * representation — prefix-filter theory only needs a consistent global
    * order, and hash order qualifies). */
  private def artifacts(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, shingleN: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      col(blockCol).cast("string").as("blk"),
      xxhash64(col(textCol)).as("h"),
      col(textCol).as("t"),
      graft.functions.TextExpressions
        .sortedShingleHashes(col(textCol), shingleN).as("sh"))

  /** Bulk (non-batch) index rows carry this sentinel batch id. */
  val BulkBid: Long = -1L

  /** LSH band explode of the shingle arrays: one (bk, id) row per MinHash
    * band, bk = xxhash64("band", band index, the band's signature slice) —
    * identical banding to [[Dedup.minhashPairs]], derived from the STORED
    * hashes ([[graft.functions.TextExpressions.minhashFromHashes]] produces
    * the same signature as hashing the text's shingles directly). */
  private def bandRows(art: DataFrame): DataFrame = {
    val rows = LshK / LshBands
    art.select(col("id"), col("bid"),
        graft.functions.TextExpressions
          .minhashFromHashes(col("sh"), LshK, LshSeed).as("sig"))
      .select(col("id"), col("bid"),
        explode(Dedup.bandHashes(col("sig"), LshBands, rows)).as("bk"))
      .select(col("bk"), col("id"), col("bid"))
  }

  /** Prefix-filter explode of the shingle arrays: one (bk, id, pos, sz)
    * row per prefix shingle, bk fused from (block, shingle hash) so the
    * candidate join is single-key. prefLen = |s| - ceil(t·|s|) + 1 — the
    * PPJoin prefix bound for Jaccard ≥ t. `pos` (1-based position of the
    * shingle in the hash-sorted set) and `sz` (set size) feed
    * [[Dedup.ppFilter]]'s positional + length pruning at probe time, so a
    * boilerplate shingle shared by millions of documents cannot go
    * quadratic on its one candidate key. */
  private def prefixRows(art: DataFrame, threshold: Double): DataFrame = {
    val prefLen = Dedup.prefLenOf(size(col("sh")), threshold)
    art.select(col("blk"), col("id"), col("bid"), size(col("sh")).as("sz"),
        posexplode(slice(col("sh"), lit(1), prefLen)))
      .select(xxhash64(col("blk"), col("col")).as("bk"), col("id"), col("bid"),
        (col("pos") + lit(1)).as("pos"), col("sz"))
  }

  /** Build (overwrite) the standing index for `corpus`. `threshold` is
    * baked into the stored prefix length — probe with the same threshold.
    * One pass derives all four tables (the artifact frame is
    * materialized once, then written four ways). */
  def write(corpus: DataFrame, textCol: String, idCol: String,
            blockCol: String, base: String, threshold: Double,
            shingleN: Int = 3, buckets: Int = 32,
            mode: SaveMode = SaveMode.Overwrite,
            batchId: Long = BulkBid): Unit =
    BucketedTables.withWriterLease(corpus.sparkSession, exactTable(base),
        "write") {
      writeImpl(corpus, textCol, idCol, blockCol, base, threshold, shingleN,
        buckets, mode, batchId, healFirst = true)
    }

  /** [[write]] body; `healFirst = false` skips the entry heal for
    * callers that already healed this call chain ([[appendKept]]) —
    * the heal's cache refresh forces a full file re-listing per table,
    * a real per-batch cost in streaming ingestion. */
  private def writeImpl(corpus: DataFrame, textCol: String, idCol: String,
                        blockCol: String, base: String, threshold: Double,
                        shingleN: Int, buckets: Int, mode: SaveMode,
                        batchId: Long, healFirst: Boolean): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // adopt any rewrite a crash split between its two catalog ops BEFORE
    // looking at table existence: an Append must see the healed table (a
    // fresh-create here would otherwise shadow the full corpus snapshot).
    // Only Append needs the cache refresh — an Overwrite reads nothing
    if (healFirst)
      healInterrupted(corpus.sparkSession, base,
        refresh = mode == SaveMode.Append)
    // bid stamped ONCE here (constant per call, so the exact table's
    // whole-row distinct still folds a replayed batch), shingle once,
    // feed four writes
    val art = artifacts(corpus, textCol, idCol, blockCol, shingleN)
      .withColumn("bid", lit(batchId))
      .localCheckpoint()
    try {
      // The writes are independent actions over the one checkpointed
      // artifact frame — submitted concurrently so the scheduler overlaps
      // them (driver-side job-submission overhead dominates small builds;
      // on a cluster the stages simply share the executors). On an
      // OVERWRITE (rebuild), the EXACT table commits LAST, sequentially:
      // its snapshot dir is the tombstone EPOCH anchor, so pending
      // deletions stay active until the whole rebuild has landed — a
      // crashed rebuild can only over-mask (safe for takedowns), never
      // resurrect. Appends never change the epoch, so the streaming hot
      // path keeps all four writes concurrent.
      // The exact table stores each holder's id (one row per DOCUMENT,
      // not per distinct text): per-document deletion must retire
      // exactly one holder's witness — a text shared by several live
      // documents keeps witnessing the exact rule for the others.
      val exactWrite = () => writeBucketed(
        art.select(col("h"), col("t"), col("bid"), col("id")).distinct(),
        exactTable(base), Seq("h", "t"), buckets, mode)
      val others = Seq(
        () => writeBucketed(prefixRows(art, threshold),
          prefTable(base), Seq("bk"), buckets, mode),
        () => writeBucketed(art.select(col("id"), col("blk"), col("sh"), col("bid")),
          shTable(base), Seq("id"), buckets, mode),
        () => writeBucketed(bandRows(art), bandTable(base), Seq("bk"), buckets, mode))
      val concurrent =
        if (mode == SaveMode.Append) others :+ exactWrite else others
      // Wait for ALL writes to SETTLE (not fail-fast): the shared
      // localCheckpoint blocks cannot be recomputed from lineage, so
      // unpersisting while sibling writes are still running would kill
      // them with missing-block errors — and in Append mode leave the
      // tables inconsistently appended. Collect every outcome,
      // unpersist in `finally`, then rethrow the first failure.
      import scala.util.{Failure, Try}
      val settled = Await.result(
        Future.sequence(concurrent.map(w => Future(w()).transform(Try(_)))),
        Duration.Inf)
      settled.collectFirst { case Failure(e) => e }.foreach(throw _)
      // liveness heartbeat: the satellite snapshots have landed — the
      // longest phase of a build/append is behind us
      BucketedTables.renewLease(corpus.sparkSession, exactTable(base))
      if (mode != SaveMode.Append) exactWrite()
      // append-pressure sidecar: count from the checkpointed artifact
      // blocks (one doc per row), no second pass over the corpus
      val nDocs = art.count()
      val spark = corpus.sparkSession
      if (mode == SaveMode.Append) foldAppended(spark, base, nDocs)
      else BucketedTables.addSidecar(spark, exactTable(base),
        AppendedSidecar, s"0 $nDocs".getBytes("UTF-8"))
    } finally
      // free the checkpoint blocks even when a write fails mid-retry —
      // otherwise every failed attempt pins a dead block set until GC
      graft.exec.Partitioning.unpersistCheckpoint(art)
    // A rebuild's commits changed the snapshot epoch, so every pending
    // tombstone is ALREADY inert (re-ingested documents must not be
    // masked); dropping the table is garbage collection. Crash-safe in
    // both directions: before the commits the old corpus stays live
    // WITH its tombstones active (a takedown never silently
    // resurfaces), after them the stale rows are epoch-mismatched
    // noise.
    if (mode != SaveMode.Append)
      BucketedTables.dropTable(corpus.sparkSession, tombsTable(base))
  }

  // lifecycle machinery shared with every standing index
  private def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                            buckets: Int, mode: SaveMode): Unit =
    BucketedTables.writeBucketed(df, table, keys, buckets, mode)

  /** [[BucketedTables.heal]] over this index's tables (the four corpus
    * tables plus the tombstone table, which goes through the same
    * scratch-then-rename overwrites during compaction) — called on
    * entry by every index-mutating/probing API. */
  private def healInterrupted(spark: SparkSession, base: String,
                              refresh: Boolean = true): Unit =
    BucketedTables.heal(spark,
      Seq(exactTable(base), prefTable(base), shTable(base), bandTable(base),
        tombsTable(base)),
      refresh)

  /** Mark documents deleted by id — the dedup twin of
    * [[SimilarityIndex.delete]]: an O(|ids|) tombstone append in ONE
    * table write (no partial-deletion window), the corpus tables are
    * never rewritten. Probes mask tombstoned ids with broadcast
    * anti-joins — the exact table stores each holder's id, so a
    * deleted document stops witnessing the exact rule while other
    * holders of the same text keep witnessing it — and the next
    * [[compact]] folds the deletions into the rewritten snapshots.
    * Each tombstone is stamped with the current snapshot EPOCH (the
    * exact table's dir name, which every rebuild commit changes LAST):
    * a crash anywhere can only over-mask (the old corpus stays live
    * with its tombstones active — a takedown never silently
    * resurfaces), never resurrect, and a completed rebuild retires
    * pending tombstones atomically with its commit. Tombstones are
    * IDEMPOTENT — a failed delete() is safely re-issued. DELETE WINS
    * over re-ingestion: the deleted document's OLD artifact rows stay
    * physically in the corpus tables until a compaction, so a document
    * re-ingested while its tombstone is pending stays masked
    * (unmasking would resurrect the old content too), and the next
    * [[compact]] removes old and re-appended rows alike. Re-ingest a
    * deleted document AFTER a compact (or a rebuild) has retired its
    * tombstone.
    *
    * Requires a current-era index (exact table stores holder ids): a
    * legacy index must be rebuilt before per-document deletion — its
    * exact rows cannot be attributed to holders. */
  def delete(spark: SparkSession, base: String, ids: DataFrame,
             idCol: String): Unit =
   // leased: a delete racing a compaction swap would stamp an epoch the
   // swap just retired — a silently lost takedown
   BucketedTables.withWriterLease(spark, exactTable(base), "delete") {
    // exact is healed too (scratch-adopt only): the epoch stamp reads
    // its live snapshot identity
    BucketedTables.heal(spark,
      Seq(exactTable(base), tombsTable(base)), refresh = false)
    val exact = spark.table(exactTable(base))
    require(exact.columns.contains("id"),
      s"$base: the exact table predates holder-id storage — rebuild the " +
        "index (write) before deleting documents")
    // migrate() backfills legacy exact rows with NULL ids (their holder
    // is unrecoverable); those rows cannot be retired per-document, so
    // deletion on such an index would be silently incomplete — refuse.
    // Parquet null-count stats prune this probe to metadata when the
    // index has no legacy rows.
    require(exact.filter(col("id").isNull).limit(1).count() == 0,
      s"$base: the exact table carries legacy rows with no holder id — " +
        "run backfillHolderIds (with the original corpus) or rebuild " +
        "the index (write) before deleting documents")
    val epoch = BucketedTables.snapshotEpoch(spark, exactTable(base))
    BucketedTables.upgradeLegacyTombs(spark, tombsTable(base), epoch)
    BucketedTables.writeBucketed(
      ids.select(col(idCol).as("id")).distinct()
        .withColumn("ep", lit(epoch)),
      tombsTable(base), Seq("id"), buckets = 4, SaveMode.Append)
   }

  // snapshot write / atomic swap / shuffle-free per-bucket dedup are
  // shared standing-index machinery ([[BucketedTables]]); aliased here
  // for this index's tests and call sites
  private[graft] def writeSnapshot(spark: SparkSession, table: String,
                                   keys: Seq[String], df: DataFrame): String =
    BucketedTables.writeSnapshot(spark, table, keys, df)

  private[graft] def swapLocation(spark: SparkSession, table: String,
                                  newPath: String): Unit =
    BucketedTables.swapLocation(spark, table, newPath)

  private[graft] def compactionFrame(spark: SparkSession, table: String): DataFrame =
    BucketedTables.compactionFrame(spark, table)

  /** Compact the standing index: fold each bucket's accumulated append
    * files back to one file, drop exact-duplicate rows a replayed
    * append may have left, and physically remove tombstoned documents.
    * Each table keeps its own catalog bucket spec — re-bucketing on
    * different keys/counts would break the probes' exchange-free scans.
    * The rewrite is per-bucket and shuffle-free ([[compactionFrame]];
    * the tombstone anti-joins broadcast their tiny side, so the corpus
    * never exchanges), lands in a fresh snapshot dir, and goes live
    * only at [[swapLocation]]'s single catalog op — a compaction that
    * dies mid-write leaves probes on the old snapshot, and one that
    * dies between table swaps leaves the unfolded tables still masked
    * by their tombstones (cleared only after ALL four fold). Run it
    * OFFLINE relative to WRITERS (probes racing the swap re-plan
    * safely; a concurrent append could land in the dir being
    * replaced) — ENFORCED by the writer lease: a racing append/delete
    * fails loudly instead of losing rows. */
  def compact(spark: SparkSession, base: String): Unit =
   BucketedTables.withWriterLease(spark, exactTable(base), "compaction") {
    healInterrupted(spark, base)
    compactImpl(spark, base)
   }

  /** [[compact]] body, unleased and pre-healed — [[compactAuto]] calls
    * it while already holding the writer lease (not reentrant). */
  private def compactImpl(spark: SparkSession, base: String): Unit = {
    // epoch + tombstones read BEFORE any scan resolves (read-order
    // contract in BucketedTables.activeTombIds)
    val tombIds = BucketedTables.activeTombIds(spark, tombsTable(base),
      BucketedTables.snapshotEpoch(spark, exactTable(base)))
    // the EXACT table swaps LAST: its snapshot dir is the tombstone
    // epoch anchor, so a compaction that dies mid-way leaves the
    // tombstones active and every unfolded table still masked; the
    // final swap retires them atomically with the fold's completion
    val tables = Seq(
      prefTable(base)  -> Seq("bk"),
      shTable(base)    -> Seq("id"),
      bandTable(base)  -> Seq("bk"),
      exactTable(base) -> Seq("h", "t"))
    BucketedTables.withForcedBucketedScan(spark) {
      // the four snapshot writes are scratch-dir work on independent
      // tables — overlapped (§2.6); every snapshot reads the PRE-swap
      // state it would have read serially (no snapshot depends on a
      // sibling table). The SWAPS stay serial and ordered below: all
      // commits happen after all writes, exact last — the same crash
      // states as before, minus the interleaved partial ones.
      val snaps = graft.exec.Concurrent.all[String](
        tables.map { case (table, keys) => () =>
          writeSnapshot(spark, table, keys,
            BucketedTables.maskByTombs(
              compactionFrame(spark, table), tombIds))
        })
      // liveness heartbeat at the phase boundary (snapshots written,
      // about to swap) — what leaseInfo's staleness check observes
      BucketedTables.renewLease(spark, exactTable(base))
      tables.zip(snaps).foreach { case ((table, _), snap) =>
        swapLocation(spark, table, snap)
      }
      // the tombstones folded above are inert now (the anchor swap
      // changed the epoch); clearing the table is garbage collection
      BucketedTables.truncateBucketed(spark, tombsTable(base), Seq("id"))
      // re-base the append-pressure sidecar from the folded snapshot
      // (read by PATH — a write path must not prime the relation cache)
      val folded = spark.read.parquet(
        BucketedTables.location(spark, exactTable(base)).toString).count()
      BucketedTables.addSidecar(spark, exactTable(base), AppendedSidecar,
        s"0 $folded".getBytes("UTF-8"))
    }
  }

  /** PARTIAL compaction: retire the pending tombstones and fold append
    * pressure by REWRITING ONLY THE FILES THAT NEED IT, carrying every
    * other file into the new snapshot by hard link / server-side copy
    * ([[BucketedTables.copyBucketFiles]]) — the full [[compact]] is a
    * linear corpus rewrite even when one document was deleted, and at
    * 100 TB that rewrite IS the cost of a takedown.
    *
    * Which files rewrite:
    *  - in `exact` and `sh` — deletions are LOCAL here (one row per
    *    holder / per document), so exactly the files physically
    *    holding a tombstoned row rewrite (discovered by an id-column +
    *    `input_file_name` scan — no text decode); plus every file of a
    *    bucket whose file count exceeds `rewriteFileThreshold`.
    *  - in `pref` and `band` — one document's rows SCATTER across
    *    buckets (each prefix shingle / band key hashes independently),
    *    so deletion-dirty tracking would mark everything; these rewrite
    *    on append pressure only. A deleted document's stale pref/band
    *    rows are VERIFY-NEUTRAL: every near candidate joins the sh
    *    table (the source of truth) by holder id before it can judge,
    *    and the compacted sh table no longer holds the deleted id — so
    *    stale accelerator rows cost a dead candidate row at probe time,
    *    never a verdict. They are physically dropped whenever their
    *    bucket rewrites for pressure, or by the next full [[compact]].
    *
    * The rewrite unit is the FILE: rewrite cost is bounded by (files
    * holding deleted rows) × (file size), independent of corpus size.
    * File-count pressure folding is OFF by default
    * (`rewriteFileThreshold = Int.MaxValue`): a fresh parallel build
    * legitimately writes many files per bucket (the same cry-wolf
    * [[needsCompact]] documents), so a count-triggered rewrite right
    * after a rebuild would silently turn the partial fold back into a
    * full one — fold fragmentation with the full [[compact]], or set a
    * threshold when the layout's file counts are actually append-driven.
    *
    * Same crash contract as [[compact]]: per-table scratch snapshot +
    * single-catalog-op swap, exact table LAST (the epoch anchor — a
    * compaction dying mid-way leaves every tombstone active and every
    * unfolded table still masked), writer lease held throughout.
    * Verdict-equivalence with the full fold (same probes, same masked
    * state) is asserted in ExtSpec. */
  def compactPartial(spark: SparkSession, base: String,
                     rewriteFileThreshold: Int = Int.MaxValue): Unit =
   BucketedTables.withWriterLease(spark, exactTable(base), "compaction") {
    healInterrupted(spark, base)
    compactPartialImpl(spark, base, rewriteFileThreshold,
      precomputedExactDirty = None)
   }

  /** [[compactPartial]] body, unleased and pre-healed;
    * `precomputedExactDirty` lets [[compactAuto]] hand over the exact
    * table's dirty-file scan its dispatch decision already paid for
    * (the sh table still discovers its own). */
  private def compactPartialImpl(
      spark: SparkSession, base: String, rewriteFileThreshold: Int,
      precomputedExactDirty: Option[Set[String]]): Unit = {
    val tombIds = BucketedTables.activeTombIds(spark, tombsTable(base),
      BucketedTables.snapshotEpoch(spark, exactTable(base)))
    // the FILES physically holding a tombstoned row — file precision,
    // not bucket precision: deletions are request-driven and sparse, so
    // the rewrite unit must be as small as the store's layout allows.
    // Discovery ([[BucketedTables.dirtyFiles]]) is one id-column +
    // file-name scan (parquet prunes every other column — in particular
    // the exact table's text is never decoded) against the tiny
    // tombstone set as an IN-literal list, so parquet row-group stats
    // prune clean files to footer reads.
    def tombDirtyFiles(table: String): Set[String] = {
      val t0 = System.nanoTime()
      val out = BucketedTables.dirtyFiles(spark, table, tombIds)
      System.err.println(f"[compactPartial] $table: dirty-file scan " +
        f"${(System.nanoTime() - t0) / 1e9}%.2fs (${out.size} files)")
      out
    }
    val tables = Seq(
      shTable(base)    -> Seq("id"),
      prefTable(base)  -> Seq("bk"),
      bandTable(base)  -> Seq("bk"),
      exactTable(base) -> Seq("h", "t"))
    BucketedTables.withForcedBucketedScan(spark) {
      // Per-table discovery + snapshot write + carry-over run as
      // concurrent legs (§2.6) — independent tables doing scratch-dir
      // work; every leg reads the PRE-swap state it would have read
      // serially. The SWAPS stay serial and ordered below (all commits
      // after all writes, exact last), so the crash contract is the
      // same as before minus the interleaved partial states.
      val prepped: Seq[Option[String]] = graft.exec.Concurrent.all(
        tables.map { case (table, keys) => () =>
        val n = bucketsOf(spark, table)
        val files = BucketedTables.bucketFilePaths(spark, table)
        val counts = files.groupBy(_._1).view.mapValues(_.size).toMap
        val pressure = counts.filter(_._2 > rewriteFileThreshold).keySet
        val deletionLocal =
          table == shTable(base) || table == exactTable(base)
        val dirty =
          if (!deletionLocal) Set.empty[String]
          else if (table == exactTable(base) && precomputedExactDirty.isDefined)
            precomputedExactDirty.get
          else tombDirtyFiles(table)
        val rewriteFiles = files.collect {
          case (b, p) if pressure(b) || dirty(p.toUri.getPath) => p }
        val carried = files.map(_._2).filterNot(rewriteFiles.toSet)
        if (rewriteFiles.isEmpty && carried.nonEmpty) {
          // UNTOUCHED table: no dirty rows, no pressure — the snapshot
          // would be byte-identical to the live one, so writing +
          // re-linking + swapping it is pure overhead (two tables per
          // fold in the common sparse-takedown case: pref/band never
          // rewrite on deletion). Skipping does not change the
          // tombstone story — retirement is the ANCHOR table's epoch
          // change, and an anchor with no dirty rows has no physical
          // rows for its tombstones to mask.
          System.err.println(s"[compactPartial] $table: untouched " +
            s"(carry=${carried.size} files in place) — skipped")
          None
        } else {
        val subset =
          if (carried.isEmpty)
            // nothing worth carrying: the full fold's shuffle-free
            // partition-per-bucket dedup
            BucketedTables.maskByTombs(compactionFrame(spark, table), tombIds)
          else
            // READ ONLY THE FILES THAT NEED REWRITING — clean files are
            // never decoded (the full-table scan was the last linear
            // cost in the fold). The raw file read loses the bucketed
            // partitioning, so the (deletion-bounded) subset pays ONE
            // repartition on the bucket keys (Spark's repartition hash
            // IS the bucket assignment, so each task holds
            // exactly one bucket) and a shuffle-free adjacent dedup
            // (identical rows share their bucket keys, so the
            // repartition already co-located them) — folding replay
            // duplicates WITHIN the subset; cross-file duplicates
            // against carried files keep waiting for a full compact
            // (verdict-neutral).
            BucketedTables.adjacentDedup(
              BucketedTables.maskByTombs(
                spark.read.schema(spark.table(table).schema)
                  .parquet(rewriteFiles.map(_.toString): _*), tombIds)
                .repartition(math.min(n, rewriteFiles.size),
                  keys.map(col): _*))
        val t0 = System.nanoTime()
        val snap = writeSnapshot(spark, table, keys, subset)
        val t1 = System.nanoTime()
        if (carried.nonEmpty)
          BucketedTables.copyBucketFiles(spark, table, carried, snap)
        System.err.println(f"[compactPartial] $table: rewrite=" +
          f"${rewriteFiles.size} carry=${carried.size} files; " +
          f"write=${(t1 - t0) / 1e9}%.2fs " +
          f"carry=${(System.nanoTime() - t1) / 1e9}%.2fs")
        Some(snap)
        }
      })
      // liveness heartbeat, then the ordered commits (exact LAST — the
      // epoch anchor retires the tombstones atomically with its swap)
      BucketedTables.renewLease(spark, exactTable(base))
      tables.zip(prepped).foreach {
        case ((table, _), Some(snap)) => swapLocation(spark, table, snap)
        case _ => ()
      }
      val t3 = System.nanoTime()
      BucketedTables.truncateBucketed(spark, tombsTable(base), Seq("id"))
      // append pressure is folded (or deliberately carried): re-base the
      // sidecar so needsCompact stops firing on mass already handled
      val folded = spark.read.parquet(
        BucketedTables.location(spark, exactTable(base)).toString).count()
      BucketedTables.addSidecar(spark, exactTable(base), AppendedSidecar,
        s"0 $folded".getBytes("UTF-8"))
      System.err.println(f"[compactPartial] tomb GC + sidecar " +
        f"${(System.nanoTime() - t3) / 1e9}%.2fs")
    }
  }

  /** Fold the standing index choosing full vs partial compaction
    * AUTOMATICALLY ([[BucketedTables.compactionChoice]], the
    * [[SimilarityIndex.compactAuto]] twin): partial when the anchor
    * (exact) table has enough files to amortize partial's fixed jobs
    * AND the deletion-dirty share leaves most of them clean; full
    * otherwise. The anchor's dirty-file scan is handed to the partial
    * fold, never paid twice. Returns the strategy that ran. Threshold
    * defaults come from the committed crossover experiments
    * (compactbench: partial ≈ full at 4k docs / ~50 steady-state exact
    * files, wins 1.4–2× above). */
  def compactAuto(spark: SparkSession, base: String,
                  minFiles: Int = 48, maxDirtyShare: Double = 0.5,
                  rewriteFileThreshold: Int = Int.MaxValue): String =
   BucketedTables.withWriterLease(spark, exactTable(base), "compaction") {
    healInterrupted(spark, base)
    val totalFiles =
      BucketedTables.bucketFilePaths(spark, exactTable(base)).size
    // cheap gate first: below the crossover, decide without paying the
    // dirty-file discovery scan the partial path would need
    val dirty: Option[Set[String]] =
      if (totalFiles < minFiles) None
      else Some(BucketedTables.dirtyFiles(spark, exactTable(base),
        BucketedTables.activeTombIds(spark, tombsTable(base),
          BucketedTables.snapshotEpoch(spark, exactTable(base)))))
    val choice = BucketedTables.compactionChoice(totalFiles,
      dirty.map(_.size).getOrElse(0), minFiles, maxDirtyShare)
    if (choice == "partial")
      compactPartialImpl(spark, base, rewriteFileThreshold, dirty)
    else compactImpl(spark, base)
    choice
   }

  /** Fold an append's doc count into the [[AppendedSidecar]]. Missing
    * sidecar (legacy index) stays missing — folding into an unknown
    * base would record a lie; the next [[compact]] establishes it. */
  private def foldAppended(spark: SparkSession, base: String,
                           nDocs: Long): Unit =
    if (BucketedTables.sidecarExists(spark, exactTable(base), AppendedSidecar)) {
      val p = new String(BucketedTables.readSidecar(
        spark, exactTable(base), AppendedSidecar), "UTF-8").split(" ")
      BucketedTables.addSidecar(spark, exactTable(base), AppendedSidecar,
        s"${p(0).toLong + nDocs} ${p(1)}".getBytes("UTF-8"))
    }

  /** Docs appended since the last snapshot fold, with the snapshot's doc
    * count — None on a legacy index that predates the sidecar (run a
    * [[compact]] once to establish it). */
  def appendedSinceSnapshot(spark: SparkSession,
                            base: String): Option[(Long, Long)] = {
    healInterrupted(spark, base)
    if (!BucketedTables.sidecarExists(spark, exactTable(base), AppendedSidecar))
      None
    else {
      val p = new String(BucketedTables.readSidecar(
        spark, exactTable(base), AppendedSidecar), "UTF-8").split(" ")
      Some((p(0).toLong, p(1).toLong))
    }
  }

  /** ACTIVE pending deletions (epoch-matched tombstones the next
    * compaction will fold) — the tombstone table is delta-sized by
    * contract, so this count is never a corpus scan. */
  def pendingTombstones(spark: SparkSession, base: String): Long = {
    healInterrupted(spark, base)
    BucketedTables.activeTombIds(spark, tombsTable(base),
        BucketedTables.snapshotEpoch(spark, exactTable(base)))
      .map(_.count()).getOrElse(0L)
  }

  /** Occupancy of the standing dedup index — the observability twin of
    * [[SimilarityIndex.stats]]: one row per (table, bucket) across the
    * four corpus tables, so an operator can SEE the state the probes'
    * exchange-free contract depends on instead of trusting it:
    *
    *  - `tbl` — `exact` / `pref` / `sh` / `band`;
    *  - `bucket` — the catalog bucket (the same Murmur3+pmod layout the
    *    bucketed writes used, recomputed from each table's bucket keys
    *    — so these rows ARE the file sets a probe's equi-join reads);
    *  - `n_rows` — the bucket's physical rows (tombstone-masked rows
    *    still get read, so they count);
    *  - `share` — fraction of the TABLE's rows in this bucket (skew in
    *    this column = one bucket dominating that table's probe I/O);
    *  - `files` — parquet files in the bucket: a freshly compacted
    *    bucket is one file, and every append adds more, so this is the
    *    small-file/compaction-pressure signal per bucket.
    *
    * One map-side-combinable aggregation per table down to ≤ buckets
    * rows; the file counts come from the snapshot dir listing (driver
    * metadata, no data read). */
  def stats(spark: SparkSession, base: String): DataFrame = {
    healInterrupted(spark, base)
    val tables = Seq(
      ("exact", exactTable(base), Seq("h", "t")),
      ("pref",  prefTable(base),  Seq("bk")),
      ("sh",    shTable(base),    Seq("id")),
      ("band",  bandTable(base),  Seq("bk")))
    val perBucket = tables.map { case (label, table, keys) =>
      val buckets = bucketsOf(spark, table)
      spark.table(table)
        .groupBy(pmod(hash(keys.map(col): _*), lit(buckets)).as("bucket"))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(label).as("tbl"), col("bucket"), col("n_rows"))
    }.reduce(_.unionByName(_))
    val fileCounts = tables.flatMap { case (label, table, _) =>
      bucketFileCounts(spark, table).map { case (b, n) => (label, b, n) }
    }
    val filesDf = spark.createDataFrame(fileCounts)
      .toDF("tbl", "bucket", "files")
    val byTbl = org.apache.spark.sql.expressions.Window.partitionBy(col("tbl"))
    perBucket
      .join(filesDf, Seq("tbl", "bucket"), "left")
      .withColumn("files", coalesce(col("files"), lit(0L)))
      .withColumn("share", col("n_rows") / sum(col("n_rows")).over(byTbl))
      .select(col("tbl"), col("bucket"), col("n_rows"), col("share"),
        col("files"))
  }

  /** Parquet files per bucket in `table`'s live snapshot dir, parsed
    * from Spark's bucketed file naming (`..._<bucket id>.c...`). */
  private def bucketFileCounts(spark: SparkSession,
                               table: String): Seq[(Int, Long)] = {
    val loc = new org.apache.hadoop.fs.Path(
      BucketedTables.location(spark, table))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val pat = ".*_(\\d{5})(?:\\.c\\d+)?\\..*parquet$".r
    fs.listStatus(loc).toSeq.filter(_.isFile).map(_.getPath.getName)
      .collect { case pat(b) => b.toInt }
      .groupBy(identity).map { case (b, fs0) => (b, fs0.size.toLong) }.toSeq
  }

  /** Advisory compaction trigger: true when deletions are pending (the
    * fold is what physically applies a takedown) or when the appended
    * doc mass since the last fold has reached `appendedRatio` of the
    * snapshot (append files accumulate per batch — the fold restores
    * one-file-per-bucket scans). An unknown append counter (legacy
    * index, pre-sidecar) decides on tombstones alone. Deliberately NOT
    * triggered by [[stats]]' `files` column: a fresh parallel build
    * legitimately writes many files per bucket, and deciding on file
    * counts would cry wolf right after every rebuild — the per-bucket
    * file signal is surfaced for the operator instead. */
  def needsCompact(spark: SparkSession, base: String,
                   appendedRatio: Double = 0.5): Boolean =
    pendingTombstones(spark, base) > 0 ||
      appendedSinceSnapshot(spark, base).exists { case (appended, snap) =>
        appended >= appendedRatio * math.max(snap, 1L)
      }

  /** Judge `delta` against the standing index — same output contract as
    * [[Dedup.dedupIncremental]] (every delta row with `keep` + drop
    * `reason`), but the corpus side of every join is a bucketed scan with
    * NO exchange: only the delta's artifacts shuffle.
    *
    * `candidates` picks the near-rule generator: `"prefix"` (lossless
    * PPJoin, the default) or `"lsh"` (MinHash bands — constant index rows
    * per document, probabilistic recall).
    *
    * `excludeBatchId`: ignore index rows stamped with this batch id — a
    * replayed micro-batch passes its own id so its earlier append (if the
    * first attempt died after appending) is invisible, and the replay
    * reproduces the original verdicts exactly. */
  def dedupIncremental(spark: SparkSession, base: String, delta: DataFrame,
                       textCol: String, idCol: String, blockCol: String,
                       threshold: Double, shingleN: Int = 3,
                       candidates: String = "prefix",
                       excludeBatchId: Long = Long.MinValue): DataFrame =
    verdictsFromEdges(delta, idCol,
      matchEdges(spark, base, delta, textCol, idCol, blockCol, threshold,
        shingleN, candidates, excludeBatchId))

  /** Derive the [[dedupIncremental]] verdict frame from a
    * [[matchEdges]] edge frame — no index access, so a caller that
    * needs BOTH (streaming ingestion maintaining a [[ClusterIndex]])
    * probes the corpus tables exactly once. */
  def verdictsFromEdges(delta: DataFrame, idCol: String,
                        edges: DataFrame): DataFrame = {
    val exactIds = edges.filter(col("rule") === "exact")
      .select(col("id_b").as("id")).distinct()
      .select(col("id"), lit(true).as("__e"))
    val nearIds = edges.filter(col("rule") === "near")
      .select(col("id_b").as("id")).distinct()
      .select(col("id"), lit(true).as("__n"))
    delta.select(col(idCol).as("id"))
      .join(exactIds, Seq("id"), "left")
      .join(nearIds, Seq("id"), "left")
      .select(col("id").as(idCol),
        (col("__e").isNull && col("__n").isNull).as("keep"),
        when(col("__e").isNotNull, "exact")
          .when(col("__n").isNotNull, "near").as("reason"))
  }

  /** The VERIFIED duplicate edges between `delta` and the live index:
    * one row per (index holder `id_a`, delta document `id_b`, rule ∈
    * 'exact' | 'near') — the same probes as [[dedupIncremental]] with
    * the matched partner's identity kept, feeding incremental
    * connected components ([[ClusterIndex.fold]]). `id_a` is NULL for
    * a legacy exact row with no stored holder id (the verdict is
    * unaffected; cluster folding drops such edges). A pair matched by
    * both rules appears twice with different `rule` tags. */
  def matchEdges(spark: SparkSession, base: String, delta: DataFrame,
                 textCol: String, idCol: String, blockCol: String,
                 threshold: Double, shingleN: Int = 3,
                 candidates: String = "prefix",
                 excludeBatchId: Long = Long.MinValue): DataFrame = {
    healInterrupted(spark, base)
    // Tombstoned documents must witness no rule: every table masks by
    // holder id (the exact table stores one row per holder for exactly
    // this purpose). Epoch + tombstones read ONCE, BEFORE any corpus
    // table resolves (BucketedTables.activeTombIds' read-order
    // contract: a racing compaction swap then over-masks, never
    // exposes a stale snapshot unmasked).
    val tombIds = BucketedTables.activeTombIds(spark, tombsTable(base),
      BucketedTables.snapshotEpoch(spark, exactTable(base)))
    // Legacy (pre-bid) indexes read as all-bulk: no stamp, no exclusion.
    def tbl(name: String) = {
      val raw = spark.table(name)
      val live =
        if (raw.columns.contains("bid"))
          raw.filter(col("bid") =!= lit(excludeBatchId)).drop("bid")
        else raw
      BucketedTables.maskByTombs(live, tombIds)
    }
    val d = artifacts(delta, textCol, idCol, blockCol, shingleN)
      .withColumn("bid", lit(BulkBid)) // probe-side stamp is never stored
      .repartition(col("id")) // one artifact pass shared by all three rules
    // Exact rule: equi-join on the 64-bit text hash (the bucket key),
    // settled by the residual full-text comparison. The index side's
    // holder id is KEPT as the edge partner (`id_a`) — NULL on a legacy
    // exact table that predates holder-id storage (the verdict needs
    // only `id_b`; cluster folding drops NULL-partner edges).
    val exactIdx = {
      val raw = tbl(exactTable(base))
      if (raw.columns.contains("id")) raw.withColumnRenamed("id", "id_a")
      else raw.withColumn("id_a", lit(null)
        .cast(spark.table(shTable(base)).schema("id").dataType))
    }
    val exactEdges = d.select(col("id").as("id_b"), col("h"),
        col("t").as("__dt"))
      .join(exactIdx, Seq("h"))
      .filter(col("t") === col("__dt"))
      .select(col("id_a"), col("id_b")).distinct()
    // Near rule: candidates from the chosen generator, verified with
    // exact Jaccard on the stored shingle arrays — both generators are
    // single-key equi-joins against their bucketed table. The prefix
    // generator prunes each match with the PPJoin positional + length
    // bounds when the stored table carries (pos, sz) — a legacy index
    // built before those columns existed still probes correctly, just
    // without the pruning (run [[migrate]] to backfill).
    val cand = candidates match {
      case "prefix" =>
        val probe = prefixRows(d, threshold)
          .select(col("bk"), col("id").as("id_b"),
            col("pos").as("__pb"), col("sz").as("__szb"))
        val idx = tbl(prefTable(base))
        val joined =
          if (idx.columns.contains("pos") && idx.columns.contains("sz"))
            probe.join(idx.select(col("bk"), col("id").as("id_a"),
                col("pos").as("__pa"), col("sz").as("__sza")), Seq("bk"))
              .filter(Dedup.ppFilter(
                col("__sza"), col("__pa"), col("__szb"), col("__pb"), threshold))
          else
            probe.join(idx.select(col("bk"), col("id").as("id_a")), Seq("bk"))
        joined.select(col("id_a"), col("id_b")).distinct()
      case "lsh" =>
        bandRows(d).withColumnRenamed("id", "id_b")
          .join(tbl(bandTable(base)).withColumnRenamed("id", "id_a"), Seq("bk"))
          .select(col("id_a"), col("id_b")).distinct()
      case other => throw new IllegalArgumentException(
        s"candidates must be 'prefix' or 'lsh', got '$other'")
    }
    val corpusSh = tbl(shTable(base))
    val nearEdges = cand
      .join(corpusSh.select(col("id").as("id_a"), col("blk").as("__blk_a"),
        col("sh").as("__sh_a")), Seq("id_a"))
      .join(d.select(col("id").as("id_b"), col("blk").as("__blk_b"),
        col("sh").as("__sh_b")), Seq("id_b"))
      // the blk equality settles fused-key collisions across blocks
      .filter(col("__blk_a") === col("__blk_b") &&
        graft.functions.TextExpressions
          .jaccardSortedLongs(col("__sh_a"), col("__sh_b")) >= threshold)
      .select(col("id_a"), col("id_b")).distinct()
    exactEdges.withColumn("rule", lit("exact"))
      .unionByName(nearEdges.withColumn("rule", lit("near")))
  }

  private def bucketsOf(spark: SparkSession, table: String): Int =
    BucketedTables.bucketsOf(spark, table)

  /** Upgrade a legacy standing index IN PLACE to the current schema —
    * probes read any era (missing columns just disable their feature),
    * but an APPEND needs the catalog schema to match, so mixed-era
    * ingestion migrates first:
    *  - tables written before batch-id stamping gain `bid` = [[BulkBid]]
    *    (their rows judge every probe, exactly as before);
    *  - a pref table written before the PPJoin pruning payload is
    *    rebuilt from the sh table, which holds every document's full
    *    shingle array — positions and sizes are derived, not guessed.
    * One-time rewrite per table, same bucket spec; a no-op on a
    * current-schema index. Each rewrite commits scratch-then-rename
    * (see [[writeBucketed]]): the new snapshot is fully written before
    * any catalog op, and a crash between the two catalog ops is healed
    * on the next index call by [[healInterrupted]].
    *
    * `rebuildPref = true` rebuilds the pref table from the sh table even
    * when its schema is current — run once when upgrading an index whose
    * prefixes were cut by an engine version with a DIFFERENT prefix
    * length for the same threshold (e.g. the pre-FP-guard formula could
    * cut one element short): schema alone cannot reveal which formula
    * cut the stored prefixes, and a too-short stored prefix silently
    * weakens recall. */
  def migrate(spark: SparkSession, base: String, threshold: Double,
              rebuildPref: Boolean = false): Unit =
    BucketedTables.withWriterLease(spark, exactTable(base), "migration") {
      migrateImpl(spark, base, threshold, rebuildPref)
    }

  /** [[migrate]] body, unleased — [[appendKept]] calls it while already
    * holding the writer lease (the lease is not reentrant). */
  private def migrateImpl(spark: SparkSession, base: String,
                          threshold: Double,
                          rebuildPref: Boolean = false): Unit = {
    healInterrupted(spark, base)
    def rewrite(table: String, keys: Seq[String], df: DataFrame): Unit = {
      val snap = df.localCheckpoint()
      try writeBucketed(snap, table, keys, bucketsOf(spark, table),
        SaveMode.Overwrite)
      finally graft.exec.Partitioning.unpersistCheckpoint(snap)
    }
    Seq(shTable(base) -> Seq("id"), bandTable(base) -> Seq("bk"))
      .foreach { case (table, keys) =>
        val t = spark.table(table)
        if (!t.columns.contains("bid"))
          rewrite(table, keys, t.withColumn("bid", lit(BulkBid)))
      }
    // Legacy exact rows predate holder-id storage and their holder is
    // unrecoverable (no id↔text mapping is stored anywhere): backfill
    // NULL — probes work unchanged (the probe drops the id column), and
    // [[delete]] refuses per-document deletion while any NULL-id row
    // remains (rebuild to regain it).
    val exact = spark.table(exactTable(base))
    if (!exact.columns.contains("bid") || !exact.columns.contains("id")) {
      val idType = spark.table(shTable(base)).schema("id").dataType
      val withBid = if (exact.columns.contains("bid")) exact
                    else exact.withColumn("bid", lit(BulkBid))
      val withId = if (withBid.columns.contains("id")) withBid
                   else withBid.withColumn("id", lit(null).cast(idType))
      rewrite(exactTable(base), Seq("h", "t"), withId)
    }
    val pref = spark.table(prefTable(base))
    if (rebuildPref ||
        !pref.columns.contains("pos") || !pref.columns.contains("sz") ||
        !pref.columns.contains("bid")) {
      val sh = spark.table(shTable(base)) // already bid-stamped above
      rewrite(prefTable(base), Seq("bk"), prefixRows(sh, threshold))
    }
  }

  /** ONE-TIME BACKFILL retiring the legacy-exact class: recover each
    * legacy exact row's holder ids from the ORIGINAL CORPUS and rewrite
    * the exact table with them, after which per-document [[delete]]
    * and partial compaction apply normally — the permanent "full fold
    * forever" penalty for pre-holder-id indexes retires with it.
    *
    * Why the corpus must be supplied: the index never stored an
    * id↔text mapping for legacy rows ([[migrate]] can only backfill
    * NULL), but the exact table DOES store each row's full text — so
    * joining it against the corpus's recomputed (text-hash, text, id)
    * triples recovers every holder, one row per holding document,
    * exactly the current write path's shape. The corpus is the data
    * the index indexes; the operator has it by definition.
    *
    * A legacy text the supplied corpus does not cover would stay
    * NULL-id — silently un-deletable — so the backfill REFUSES loudly
    * instead (supply the corpus the index was built over). Extra
    * corpus documents the index never held are ignored: this is a
    * repair, not an ingest. Runs under the writer lease; the rewrite
    * commits scratch-then-rename like every snapshot replacement and
    * leaves probes bit-identical (probes don't read `id`). */
  def backfillHolderIds(spark: SparkSession, base: String,
                        corpus: DataFrame, textCol: String, idCol: String,
                        threshold: Double): Unit =
   BucketedTables.withWriterLease(spark, exactTable(base), "migration") {
    migrateImpl(spark, base, threshold) // ensure the id column exists
    // The rewrite below commits a NEW snapshot epoch, which would turn
    // any pending tombstone inert — resurrecting rows the backfill
    // deliberately preserves. delete() refuses on an index with
    // legacy rows, so this state should not arise; refuse rather than
    // trust that (run compact() to retire the tombstones first).
    require(BucketedTables.activeTombIds(spark, tombsTable(base),
        BucketedTables.snapshotEpoch(spark, exactTable(base)))
      .forall(_.isEmpty),
      s"$base: tombstones pending — the backfill's snapshot commit " +
        "would retire them WITHOUT removing the rows (a resurrect); " +
        "run compact() first")
    val exact = spark.table(exactTable(base))
    val legacy = exact.filter(col("id").isNull).localCheckpoint()
    try if (!legacy.isEmpty) {
      val idType = exact.schema("id").dataType
      val fresh = corpus.select(xxhash64(col(textCol)).as("h"),
        col(textCol).as("t"), col(idCol).cast(idType).as("id"))
      val orphans = legacy.select("h", "t").distinct()
        .join(fresh, Seq("h", "t"), "left_anti").count()
      require(orphans == 0L,
        s"$base: $orphans legacy exact texts have no holder in the " +
          "supplied corpus — backfilling them would leave NULL-id rows " +
          "that stay silently un-deletable; supply the corpus the index " +
          "was built over")
      val recovered = legacy.drop("id").join(fresh, Seq("h", "t"))
        .select(col("h"), col("t"), col("bid"), col("id")).distinct()
      val snap = exact.filter(col("id").isNotNull)
        .select(col("h"), col("t"), col("bid"), col("id"))
        .unionByName(recovered).localCheckpoint()
      try writeBucketed(snap, exactTable(base), Seq("h", "t"),
        bucketsOf(spark, exactTable(base)), SaveMode.Overwrite)
      finally graft.exec.Partitioning.unpersistCheckpoint(snap)
    } finally graft.exec.Partitioning.unpersistCheckpoint(legacy)
   }

  /** Fold a judged batch's KEPT rows into the index (bucket-preserving
    * appends) — the state transition of continuous ingestion. The bucket
    * count is read from the existing table's spec: an append with a
    * different count would be rejected by the catalog. A legacy-schema
    * index is migrated first (appends resolve columns by name against
    * the catalog schema, so a missing column would reject the append). */
  /** The index's live snapshot epoch (the exact table's snapshot-dir
    * name), healed first so a crash adoption cannot later read as a
    * foreign swap. Capture this BEFORE probing ([[matchEdges]]) and pass
    * it to [[appendKept]]'s `expectEpoch` — the single-writer-per-index
    * contract then becomes CHECKED instead of assumed: a compaction or
    * rebuild committed by another session between probe and append
    * changes the epoch, and the append refuses loudly instead of folding
    * rows judged against a retired snapshot through stale caches. */
  def snapshotEpoch(spark: SparkSession, base: String): String = {
    healInterrupted(spark, base, refresh = false)
    BucketedTables.snapshotEpoch(spark, exactTable(base))
  }

  /** `healRefresh = false` keeps the crash-adopt half of the entry heal
    * but skips the per-table relation-cache refresh — for callers that
    * ALREADY refreshed this batch (streaming ingestion probes the index
    * with [[matchEdges]], which heals with refresh, right before
    * appending; a second refresh mid-batch forces five full file
    * re-listings that can only re-observe the probe's own state).
    * Such callers pass the probe-time [[snapshotEpoch]] as `expectEpoch`
    * so the skipped refresh stays sound by CHECK, not assumption: the
    * epoch is re-read here inside the writer lease (one metadata read —
    * no concurrent swap can be mid-flight) and a mismatch refuses the
    * append instead of landing rows judged against a replaced
    * snapshot. */
  def appendKept(spark: SparkSession, base: String, batch: DataFrame,
                 verdicts: DataFrame, textCol: String, idCol: String,
                 blockCol: String, threshold: Double,
                 shingleN: Int = 3, batchId: Long = BulkBid,
                 healRefresh: Boolean = true,
                 expectEpoch: Option[String] = None): Unit =
   // leased: rows appended while a compaction is writing its snapshots
   // would land in a dir the swaps are about to replace and vanish
   BucketedTables.withWriterLease(spark, exactTable(base), "append") {
    healInterrupted(spark, base, refresh = healRefresh)
    expectEpoch.foreach { probed =>
      val live = BucketedTables.snapshotEpoch(spark, exactTable(base))
      require(live == probed,
        s"$base: index snapshot advanced between probe and append " +
          s"(probed epoch $probed, live epoch $live) — another writer " +
          "compacted or rebuilt this index mid-batch; re-probe " +
          "(matchEdges) against the live snapshot before appending")
    }
    val exactCols = spark.table(exactTable(base)).columns
    if (!exactCols.contains("bid") || !exactCols.contains("id") ||
        !spark.table(prefTable(base)).columns.contains("pos"))
      migrateImpl(spark, base, threshold)
    val buckets = bucketsOf(spark, exactTable(base))
    val kept = batch.join(
      verdicts.filter(col("keep")).select(col(idCol)), Seq(idCol), "left_semi")
    // a kept id with a PENDING tombstone lands but stays masked: delete
    // wins until a compaction retires the tombstone (see [[delete]])
    // healFirst = false: this call chain healed (with refresh) above
    writeImpl(kept, textCol, idCol, blockCol, base, threshold, shingleN,
      buckets, mode = SaveMode.Append, batchId = batchId, healFirst = false)
  }
}
