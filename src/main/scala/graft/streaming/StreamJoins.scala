package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream (and batch-twin) event-time interval joins.
  *
  * The reference has no join surface at all (SURVEY.md §2.5); this is the
  * engine's streaming-native join shape: equality on a key plus a bounded
  * event-time range. The time bound is not an optimization detail — on
  * streaming inputs it is what lets Spark expire join state (each side
  * keeps only rows newer than watermark − window), so state stays
  * O(rate × window) instead of growing with the stream. */
object StreamJoins {

  /** Rows of `left` matched to rows of `right` with equal keys and
    * `rightTs` in `[leftTs, leftTs + window]`.
    *
    * Column names must be disjoint (callers rename before joining — the
    * two sides of a streaming self-join are separate scans anyway). For
    * streaming inputs, both sides must carry `withWatermark` on their ts
    * column; the same plan runs unchanged on batch frames (proven equal in
    * StreamSpec). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   window: String): DataFrame =
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"))
}
