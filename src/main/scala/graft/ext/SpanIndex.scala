package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Standing substring-dedup index: the distinct ≥w-token window hashes of
  * everything ingested so far, bucketed + sorted by hash, so each new
  * batch can be span-trimmed against 100 TB of history without
  * rescanning or reshuffling that history.
  *
  * [[Dedup.trimSpans]] dedups one static corpus; ingestion pipelines see
  * a stream of batches instead, and each batch must lose (a) every span
  * the corpus already owns and (b) every within-batch duplicate span
  * except its first occurrence — after which the batch's surviving spans
  * join the index. Storing only distinct 8-byte hashes keeps the index a
  * small fraction of corpus bytes; bucketing by `h` makes the probe a
  * bucket-local sort-merge join in which only the delta shuffles.
  *
  * Extension surface — the reference (timfi/wrangle_pypes) holds no
  * standing state; conventions follow [[DedupIndex]]/[[SimilarityIndex]]
  * (versioned snapshots, writer lease, sidecar-pinned parameters). The
  * window width `w` is pinned in a snapshot sidecar at build time so a
  * probe can never silently fingerprint with a different width than the
  * index was built with. */
object SpanIndex {
  def hashTable(base: String) = s"${base}_spanh"
  // leading underscore: Spark's file listing skips it, so the bucketed
  // scan never mistakes the sidecar for a bucket file
  private val WSidecar = "_span_w"

  /** Batch stamp of bulk (non-streaming) writes. Streaming appends stamp
    * rows with a per-micro-batch id instead, so a replayed batch can
    * probe with its own first attempt's rows EXCLUDED and reproduce the
    * original trim verdicts (same protocol as [[DedupIndex]]). */
  val BulkBid = 0L

  /** Build the index over an already-deduped corpus. */
  def write(corpus: DataFrame, textCol: String, idCol: String, base: String,
            w: Int = 6, buckets: Int = 8): Unit = {
    val h = Dedup.spanWindows(corpus, textCol, idCol, w)
      .select("h").distinct()
      .withColumn("bid", lit(BulkBid))
    BucketedTables.writeBucketed(h, hashTable(base), Seq("h"), buckets,
      SaveMode.Overwrite,
      sidecar = Seq(WSidecar -> w.toString.getBytes("UTF-8")))
  }

  /** The window width the index was built with (sidecar-pinned). */
  def windowWidth(spark: SparkSession, base: String): Int =
    new String(BucketedTables.readSidecar(spark, hashTable(base), WSidecar),
      "UTF-8").toInt

  /** Span-trim a delta batch against the standing corpus and itself.
    * A window hash present in the index removes every batch occurrence
    * (the corpus owns the canonical copy); a hash new to this batch but
    * duplicated within it keeps its first (id, pos) occurrence — the
    * same canonical rule as [[Dedup.trimSpans]]. Every delta doc comes
    * back: (idCol, kept_tokens, trimmed_text). */
  def trimIncremental(spark: SparkSession, base: String, delta: DataFrame,
                      textCol: String, idCol: String,
                      excludeBid: Option[Long] = None): DataFrame = {
    val w = windowWidth(spark, base)
    val we = Dedup.spanWindows(delta, textCol, idCol, w)
    val idx = excludeBid
      .foldLeft(spark.table(hashTable(base)))((t, b) => t.filter(col("bid") =!= b))
      .select(col("h"))
    val fromIndex = we.join(idx, Seq("h"), "left_semi")
      .select(col("id"), col("n_tokens"), col("pos"))
    val canon = we.groupBy("h")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("id"), col("pos"))).as("canon"))
      .filter(col("n_occ") > 1)
      .select(col("h"), col("canon"))
    val withinDelta = we.join(canon, Seq("h"))
      .filter(struct(col("id"), col("pos")) =!= col("canon"))
      .select(col("id"), col("n_tokens"), col("pos"))
    val hits = fromIndex.unionAll(withinDelta).distinct()
    Dedup.removeCovered(delta, textCol, idCol, Dedup.mergeIslands(hits, w))
  }

  /** Publish a trimmed batch: append its surviving window hashes, minus
    * the ones already indexed (the anti join keeps the table duplicate-
    * free so probe fan-out never grows). Leased, like every mutation of
    * a bucketed index table, so rows cannot land in a snapshot dir a
    * concurrent rewrite is about to replace. */
  def append(spark: SparkSession, base: String, trimmed: DataFrame,
             textCol: String, idCol: String, bid: Long = BulkBid): Unit =
    BucketedTables.withWriterLease(spark, hashTable(base), "append") {
      val w = windowWidth(spark, base)
      // anti join against EVERY visible row (all bids): a replayed batch
      // finds its first attempt's rows already present and appends
      // nothing, so append is idempotent under restart-replay
      val fresh = Dedup.spanWindows(
          trimmed.filter(length(trim(col(textCol))) > 0), textCol, idCol, w)
        .select("h").distinct()
        .join(spark.table(hashTable(base)).select("h"), Seq("h"), "left_anti")
        .withColumn("bid", lit(bid))
      BucketedTables.writeBucketed(fresh, hashTable(base), Seq("h"),
        bucketsOf(spark, hashTable(base)), SaveMode.Append)
    }

  /** Compact the hash table: fold each bucket's accumulated append files
    * (streaming leaves one file set per micro-batch) back to one file per
    * bucket and drop exact-duplicate rows a replayed append may have
    * left. Shuffle-free ([[BucketedTables.compactionFrame]]: forced
    * one-partition-per-bucket scan, within-partition sort + adjacent
    * dedup IS a global dedup), lands in a fresh snapshot dir with the
    * width sidecar re-pinned, goes live at [[BucketedTables
    * .swapLocation]]'s single catalog op, and holds the writer lease so
    * a racing append fails loudly instead of landing in the replaced
    * dir. */
  def compact(spark: SparkSession, base: String): Unit =
    BucketedTables.withWriterLease(spark, hashTable(base), "compaction") {
      val w = windowWidth(spark, base)
      val path = BucketedTables.withForcedBucketedScan(spark) {
        BucketedTables.writeSnapshot(spark, hashTable(base), Seq("h"),
          BucketedTables.compactionFrame(spark, hashTable(base)),
          sidecar = Seq(WSidecar -> w.toString.getBytes("UTF-8")))
      }
      BucketedTables.swapLocation(spark, hashTable(base), path)
    }

  /** Cheap compaction advisory: data files in the live snapshot vs the
    * bucket count — pure file listing, never scans rows. */
  def needsCompact(spark: SparkSession, base: String,
                   maxFilesPerBucket: Int = 4): Boolean = {
    val loc = new org.apache.hadoop.fs.Path(
      BucketedTables.location(spark, hashTable(base)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(loc).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    dataFiles > maxFilesPerBucket.toLong *
      bucketsOf(spark, hashTable(base))
  }

  /** Observability surface (the [[DedupIndex.stats]] twin): occupancy and
    * provenance of the hash table as (metric, value) rows — total rows,
    * distinct hashes (equal to total unless an append protocol violation
    * slipped duplicates in: a drift indicator, like the ANN index's
    * occupancy sidecar check), bulk-vs-appended split, bucket count and
    * the sidecar-pinned window width. The aggregate collects one row of
    * counters — driver-sized by construction. */
  def stats(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    val row = spark.table(hashTable(base)).agg(
      count(lit(1)).as("hashes"),
      count_distinct(col("h")).as("distinct_hashes"),
      sum(when(col("bid") === BulkBid, 1L).otherwise(0L)).as("bulk"),
      sum(when(col("bid") =!= BulkBid, 1L).otherwise(0L)).as("appended"))
      .collect().head
    def longAt(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
    Seq(
      ("hashes", longAt(0)),
      ("distinct_hashes", longAt(1)),
      ("bulk_hashes", longAt(2)),
      ("appended_hashes", longAt(3)),
      ("buckets", bucketsOf(spark, hashTable(base)).toLong),
      ("w", windowWidth(spark, base).toLong))
      .toDF("metric", "value")
  }

  private def bucketsOf(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(sys.error(s"$table: not bucketed — rebuild the index"))
}
