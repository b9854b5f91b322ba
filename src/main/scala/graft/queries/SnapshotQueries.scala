package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Snapshots, TextAnalysis}

/** Driver-checked queries for incremental-recrawl processing: snapshot
  * diffing and delta-only processing. Snapshot B is synthesized
  * deterministically from `documents` (deletions, edits, additions by
  * doc_id residue — same recipe in the oracle), so the diff exercises all
  * four statuses. */
object SnapshotQueries {

  /** Snapshot B: drop doc_id≡0 (mod 7); append " [updated]" to doc_id≡0
    * (mod 5); add brand-new docs (id+10M, "new "+text) for doc_id≡0
    * (mod 11). Deletion takes precedence over edit (filter first). */
  def snapB(d: DataFrame): DataFrame = {
    val kept = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [updated]")))
          .otherwise(col("text")).as("text"))
    val added = d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("new "), col("text")).as("text"))
    kept.unionByName(added)
  }

  private val snapBSql: String =
    """b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' [updated]' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id, 'new ' || text AS text
      |  FROM documents WHERE doc_id % 11 = 0)""".stripMargin

  // ------------------------------------------------------ q_snapshot_diff

  /** Full-corpus change detection between two snapshots — hash-projected
    * full outer join; text bodies never reach the exchange. */
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val a = Tables(s, dir, "documents")
    Snapshots.diff(a, snapB(a), "doc_id", "text")
  }

  val qSnapshotDiffSql: String =
    s"""WITH $snapBSql,
       |ah AS (SELECT doc_id,
       |  CASE WHEN text IS NULL THEN '<NULL>' ELSE md5(text) END AS h_a
       |  FROM documents),
       |bh AS (SELECT doc_id,
       |  CASE WHEN text IS NULL THEN '<NULL>' ELSE md5(text) END AS h_b
       |  FROM b)
       |SELECT coalesce(ah.doc_id, bh.doc_id) AS doc_id,
       |  CASE WHEN h_a IS NULL THEN 'added'
       |       WHEN h_b IS NULL THEN 'deleted'
       |       WHEN h_a = h_b THEN 'unchanged'
       |       ELSE 'changed' END AS status
       |FROM ah FULL OUTER JOIN bh ON ah.doc_id = bh.doc_id""".stripMargin

  // ------------------------------------------------------- q_incr_delta

  /** Delta-only processing: added+changed docs of snapshot B run the
    * quality/token stage; unchanged and deleted docs cost nothing beyond
    * the hash diff. */
  def qIncrDelta(s: SparkSession, dir: String): DataFrame = {
    val a = Tables(s, dir, "documents")
    Snapshots.delta(a, snapB(a), "doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
  }

  private val swList = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")

  val qIncrDeltaSql: String =
    s"""WITH $snapBSql,
       |ah AS (SELECT doc_id,
       |  CASE WHEN text IS NULL THEN '<NULL>' ELSE md5(text) END AS h_a
       |  FROM documents),
       |bh AS (SELECT doc_id,
       |  CASE WHEN text IS NULL THEN '<NULL>' ELSE md5(text) END AS h_b
       |  FROM b),
       |dl AS (SELECT bh.doc_id FROM bh LEFT JOIN ah ON ah.doc_id = bh.doc_id
       |       WHERE ah.h_a IS NULL OR ah.h_a <> bh.h_b),
       |x AS (SELECT b.doc_id, b.text FROM b JOIN dl ON b.doc_id = dl.doc_id),
       |t AS (SELECT doc_id, text,
       |  string_split_regex(lower(trim(text)), '[ \\t\\n\\f\\r]+') AS toks FROM x),
       |m AS (SELECT doc_id,
       |  len(toks) AS n_tokens,
       |  len(regexp_extract_all(lower(text), '[^a-z0-9 \\t\\n\\f\\r]'))::DOUBLE
       |    / greatest(length(text), 1) AS punct_ratio,
       |  len(list_filter(toks, x -> x IN ($swList)))::DOUBLE
       |    / greatest(len(toks), 1) AS stopword_ratio,
       |  list_sum(list_transform(toks, x -> length(x)))::DOUBLE
       |    / greatest(len(toks), 1) AS mean_token_len
       | FROM t)
       |SELECT doc_id, n_tokens,
       |  0.3 * (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END)
       |  + 0.2 * (CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
       |  + 0.3 * (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END)
       |  + 0.2 * (1.0 - least(punct_ratio * 5.0, 1.0)) AS quality
       |FROM m""".stripMargin

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_incr_delta"    -> (qIncrDelta _))

  val oracle: Map[String, String] = Map(
    "q_snapshot_diff" -> qSnapshotDiffSql,
    "q_incr_delta"    -> qIncrDeltaSql)
}
