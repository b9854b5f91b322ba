package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Standing ANN index: the IVF structure persisted as a BUCKETED table so
  * repeated query batches probe the corpus WITHOUT re-assigning or even
  * re-scanning it — the similarity twin of [[DedupIndex]], and the shape
  * vector search takes at 100 TB:
  *
  *  - `<base>_cells(cell, id, v)` — every corpus vector with its coarse
  *    cell id, bucketed AND sorted by `cell`. A probe filters
  *    `cell IN (probed cells)`, which Spark's bucket pruning turns into
  *    reading ONLY the probed buckets (`SelectedBucketsCount` in the
  *    scan) — at nprobe/C selectivity the probe touches that fraction of
  *    the corpus FILES, not just rows;
  *  - `<base>_centroids(cell, centroid)` — the trained coarse quantizer,
  *    k×dim rows. Classic IVF keeps the quantizer driver-resident; the
  *    table exists so a LATER SESSION recovers it without retraining.
  *
  * Training is [[Similarity.kmeansCentroids]] (deterministic Lloyd
  * rounds), assignment and probe selection are the same fused
  * centroid-cosine expressions as [[Similarity.ivfTopKWith]] — so the
  * index-backed search returns EXACTLY the ad-hoc trained-IVF results
  * (oracle-checked as q_sim_ivf_idx against the q_sim_ivf_trained SQL).
  * Lifecycle (versioned snapshots, crash-safe overwrite commits, heal on
  * entry) comes from [[BucketedTables]]. */
object SimilarityIndex {

  def cellsTable(base: String)     = s"${base}_cells"
  def centroidsTable(base: String) = s"${base}_centroids"

  /** Build (overwrite) the standing index: train the coarse quantizer
    * with `iters` Lloyd rounds, assign every corpus vector its cell, and
    * persist cells (bucketed by cell) + centroids. `buckets` bounds probe
    * parallelism per cell group; at scale pick k so a cell's vectors are
    * a few hundred MB and buckets ≈ k (one bucket per cell makes bucket
    * pruning exact). */
  def write(corpus: DataFrame, vecCol: String, idCol: String, base: String,
            k: Int, iters: Int, buckets: Int = 32): Unit = {
    val spark = corpus.sparkSession
    BucketedTables.heal(spark, Seq(cellsTable(base), centroidsTable(base)))
    val (cids, cents) = Similarity.kmeansCentroids(
      corpus, vecCol, idCol, k, iters)
    val assigned = Similarity.assignCells(corpus, vecCol, idCol,
      cids.zip(cents))
    BucketedTables.writeBucketed(assigned, cellsTable(base), Seq("cell"),
      buckets, SaveMode.Overwrite)
    import spark.implicits._
    BucketedTables.writeBucketed(
      cids.zip(cents).toDF("cell", "centroid"),
      centroidsTable(base), Seq("cell"), math.min(buckets, cids.size),
      SaveMode.Overwrite)
  }

  /** Top-k cosine neighbors for `queries` against the standing index.
    * The quantizer is read back to the driver (k×dim — the classic IVF
    * memory contract), probe cells are selected query-side with the same
    * fused expression as assignment, and the corpus scan carries a
    * `cell IN (...)` filter over the DRIVER-SIZED probed-cell set (≤ k
    * values) so bucket pruning skips every unprobed bucket's files. */
  def topK(spark: SparkSession, base: String, queries: DataFrame,
           k: Int, nprobe: Int, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    BucketedTables.heal(spark, Seq(cellsTable(base), centroidsTable(base)))
    val cents = spark.table(centroidsTable(base))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    val probes = Similarity.probeCells(queries, vecCol, idCol, cents, nprobe)
    // ≤ k distinct cell values regardless of query count — driver-sized
    // by construction, and the literal IN list is what bucket pruning
    // needs to skip unprobed buckets at scan time
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    val corpus = spark.table(cellsTable(base))
      .filter(col("cell").isin(probedCells: _*))
      .select(col("cell"), col("id").as("cand_id"), col("v").as("cv"))
    Similarity.topKPerKey(
      corpus.join(broadcast(probes), Seq("cell"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          Similarity.cosine(col("qv"), col("cv")).as("sim")),
      k)
  }
}
