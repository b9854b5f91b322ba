package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.ext.Multimodal

/** Measured-growth companion to the scale rehearsal (`tools/slopes.py`):
  * for every query the rehearsal flags as super-linear, measure the
  * quantity that EXPLAINS the slope — output rows at both fixtures, and
  * for the codec family the decoded payload bytes — so every flagged
  * SCALE entry carries a measured note instead of a story (VERDICT r10
  * "flagged_superlinear under-flags").
  *
  * `_verified` contract-breach companions output 0 rows by design (empty
  * = no breach), so their workload is measured through their production
  * twin (the frame whose replay they re-instantiate), recorded with a
  * `proxy` field so the note says what was measured.
  *
  * Usage: runMain graft.tools.GrowthDiag <smallDir> <bigDir> <out.json>
  *        [q1,q2,...]   (default: the r10 flagged set)
  * Emits: {queries: {q: {rows_small, rows_big[, proxy]}},
  *         media_bytes_by_query: {q: {bytes_small, bytes_big, table}}} */
object GrowthDiag {

  /** Contract-breach companions measured through their production twin. */
  val Proxy: Map[String, String] = Map(
    "q_near_dup_verified" -> "q_near_dup",
    "q_dedup_minhash_verified" -> "q_dedup_minhash",
    "q_dedup_simhash_verified" -> "q_dedup_simhash",
    "q_emb_near_dup_verified" -> "q_emb_near_dup")

  /** Codec queries -> the synthesized media table they decode. */
  val MediaTable: Map[String, (String, DataFrame => DataFrame)] = Map(
    "q_multimodal_decode" -> ("bmp", Multimodal.bmpTable(_)),
    "q_multimodal_png" -> ("png", Multimodal.pngTable(_)),
    "q_multimodal_resize_png" -> ("png", Multimodal.pngTable(_)),
    "q_multimodal_quarantine" -> ("png", Multimodal.pngTable(_)),
    "q_multimodal_jpeg" -> ("jpeg", Multimodal.jpegTable(_)),
    "q_multimodal_tiff" -> ("tiff", Multimodal.tiffTable(_)),
    "q_multimodal_gif" -> ("gif", Multimodal.gifTable(_)),
    "q_multimodal_video" -> ("avi", Multimodal.aviTable(_)),
    "q_multimodal_avi_mjpg" -> ("avi_mjpg", Multimodal.aviMjpgTable(_)),
    "q_multimodal_mp4" -> ("mp4", Multimodal.mp4Table(_)),
    "q_multimodal_fmp4" -> ("fmp4", Multimodal.fmp4Table(_)))

  /** The r10 flagged set (slope > 5 at the 10x rehearsal). */
  val DefaultQueries: Seq[String] = Seq(
    "q_near_dup_verified", "q_dedup_minhash_verified", "q_emb_near_dup",
    "q_emb_near_dup_verified", "q_dedup_simhash", "q_editdist_join",
    "q_multimodal_mp4", "q_multimodal_fmp4", "q_multimodal_resize_png",
    "q_multimodal_avi_mjpg", "q_dedup_jaccard", "q_khop",
    "q_multimodal_video", "q_span_pairs", "q_dedup_simhash_verified",
    "q_multimodal_png", "q_fuzzy_lookup", "q_cluster_exact",
    "q_multimodal_quarantine", "q_multimodal_jpeg", "q_contrastive",
    "q_corpus_prep", "q_multimodal_tiff", "q_image_dedup")

  def main(args: Array[String]): Unit = {
    val Array(small, big, out) = args.take(3)
    val queries =
      if (args.length > 3) args(3).split(",").toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rowsOf(q: String, dir: String): Long =
      SparkEntry.queries(q)(spark, dir).count()

    val pseudo = Set("verify_gate", "cluster_pairs")
    val qEntries = queries.filterNot(pseudo).map { q =>
      val measured = Proxy.getOrElse(q, q)
      val rs = rowsOf(measured, small)
      val rb = rowsOf(measured, big)
      System.err.println(s"[growth] $q rows ($measured): $rs -> $rb")
      val proxy = Proxy.get(q).map(p => s""","proxy":"$p"""").getOrElse("")
      s""""$q":{"rows_small":$rs,"rows_big":$rb$proxy}"""
    }

    val mEntries = queries.flatMap(q => MediaTable.get(q).map { case (t, f) =>
      def bytesOf(dir: String): Long =
        f(Tables(spark, dir, "documents"))
          .agg(sum(octet_length(col("media")))).head.getLong(0)
      val bs = bytesOf(small)
      val bb = bytesOf(big)
      System.err.println(s"[growth] $q media($t) bytes: $bs -> $bb")
      s""""$q":{"bytes_small":$bs,"bytes_big":$bb,"table":"$t"}"""
    })

    // the pair-minimal verify gate's measured effect (Dedup.
    // prefixJaccardPairs): PPJoin-surviving verify rows before/after
    // keeping only each pair's first-common-prefix-element row —
    // requested with the pseudo-query name "verify_gate"
    val gateEntry = if (!queries.contains("verify_gate")) "" else {
      def statsOf(dir: String): (Long, Long) =
        graft.ext.Dedup.prefixVerifyGateStats(
          Tables(spark, dir, "documents"), "text", "doc_id", "lang",
          threshold = 0.5)
      val (ps, qs) = statsOf(small)
      val (pb, qb) = statsOf(big)
      System.err.println(
        s"[growth] verify_gate rows: small $ps -> $qs, big $pb -> $qb")
      s""","verify_gate":{"pre_small":$ps,"post_small":$qs,""" +
        s""""pre_big":$pb,"post_big":$qb}"""
    }

    // q_dedup_clusters' cost drivers, measured (r14 verdict ask #6: keep
    // "output-bound" a CHECKED claim): the LSH candidate count (pairs
    // surviving the band-bucket join + estimate filter, the verify
    // stage's input) and the emitted true-pair count (the CC stage's
    // edge list) at both fixtures — pseudo-query name "cluster_pairs"
    val clusterEntry = if (!queries.contains("cluster_pairs")) "" else {
      val t = 0.8 // DedupClustersThreshold
      def statsOf(dir: String): (Long, Long) = {
        val docs = Tables(spark, dir, "documents")
        val cands = graft.ext.Dedup.minhashPairs(docs, "text", "doc_id",
          minEstimate = t * 0.5).count()
        val pairs = graft.ext.Dedup.nearDupPairs(docs, "text", "doc_id",
          threshold = t).count()
        (cands, pairs)
      }
      val (cs, ps) = statsOf(small)
      val (cb, pb) = statsOf(big)
      System.err.println(s"[growth] cluster_pairs: candidates $cs -> $cb, " +
        s"true pairs $ps -> $pb")
      s""","cluster_pairs":{"candidates_small":$cs,"candidates_big":$cb,""" +
        s""""pairs_small":$ps,"pairs_big":$pb}"""
    }

    val json = s"""{"small":"$small","big":"$big",""" +
      s""""queries":{${qEntries.mkString(",")}},""" +
      s""""media_bytes_by_query":{${mEntries.mkString(",")}}""" +
      s"""$gateEntry$clusterEntry}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"[growth] wrote $out")
    spark.stop()
  }
}
