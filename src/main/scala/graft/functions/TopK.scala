package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (score desc, id asc) entries
  * per group with partial (map-side) aggregation.
  *
  * Why this exists when `row_number().over(window)` already answers top-k:
  * the window formulation shuffles EVERY candidate row to its key's
  * partition and sorts them all; this aggregator reduces each partition to
  * ≤ k entries per key before the exchange — at 100 TB the shuffle drops
  * from |candidates| to |keys|·k. The same (b)-level machinery
  * (`Aggregator`, not a custom SparkPlan) Spark uses for its own typed
  * aggregates. Buffer is a sorted Vector (k is small); merge is a bounded
  * merge-take. */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // entries as (score, id), kept sorted: score desc, id asc
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, (in._2, in._1))

  private def insert(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && better(buf.last, e)) buf
    else {
      val i = buf.indexWhere(x => better(e, x)) match {
        case -1 => buf.size
        case n  => n
      }
      val merged = (buf.take(i) :+ e) ++ buf.drop(i)
      if (merged.size > k) merged.take(k) else merged
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
