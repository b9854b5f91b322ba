package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-recrawl operators: diff two corpus snapshots and process
  * only the delta. At 100 TB a recrawl overlaps the previous snapshot
  * almost entirely — re-running extraction/quality/dedup over the full
  * corpus every cycle is the canonical scale mistake. The shape here:
  *
  *  1. [[diff]] compares (id, content-hash) projections — the full-outer
  *     join exchanges ~48 bytes/row, never the document bodies, and both
  *     projections push column pruning into the parquet scan (ReadSchema
  *     is (id, text) → hashed in the map stage before the exchange).
  *  2. [[delta]] semi-joins the new snapshot against the non-unchanged
  *     ids, so downstream operators (quality, dedup, indexing) touch only
  *     added+changed documents.
  *
  * The content hash is computed independently per engine (md5 here, md5
  * in the oracle) and only ever COMPARED within the engine, so no
  * cross-engine hash parity is required. */
object Snapshots {

  /** Per-document change status between snapshot `a` (old) and `b` (new):
    * `added` (only in b), `deleted` (only in a), `changed` (both, content
    * hash differs), `unchanged`. */
  /** Content hash that keeps NULL text representable: md5(NULL) is NULL,
    * and a NULL hash is indistinguishable from "row absent" in the
    * full-outer join, which would misreport a NULL-text doc present in
    * both snapshots as added+deleted. A non-hex sentinel (md5 output is
    * 32 hex chars, so no collision) keeps NULL a first-class content
    * state: NULL→NULL compares unchanged, NULL→text compares changed. */
  private def contentHash(c: org.apache.spark.sql.Column) =
    when(c.isNull, lit("<NULL>")).otherwise(md5(c))

  def diff(a: DataFrame, b: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ah = a.select(col(idCol), contentHash(col(textCol)).as("h_a"))
    val bh = b.select(col(idCol), contentHash(col(textCol)).as("h_b"))
    ah.join(bh, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("h_a").isNull, lit("added"))
          .when(col("h_b").isNull, lit("deleted"))
          .when(col("h_a") === col("h_b"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The rows of the new snapshot that need processing: added + changed.
    * A semi join on the diff keeps the text column out of the diff's
    * exchange; only delta rows carry their bodies onward. */
  def delta(a: DataFrame, b: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = diff(a, b, idCol, textCol)
      .filter(col("status").isin("added", "changed"))
    b.join(d.select(col(idCol)), Seq(idCol), "left_semi")
  }
}
