package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Spark's runtime-filter bloom expressions (spark.util.sketch.BloomFilter
  * under a TypedImperativeAggregate), surfaced as engine functions — the
  * optimizer only injects them itself for shuffle-join runtime filters,
  * but the same sketch is the right PREFILTER whenever a key set is too
  * big to hash-broadcast yet fits as bits (a bloom holds ~10⁸ keys in
  * 64 MB where a broadcast hash relation would not fit at all).
  * No false negatives, so exact operators built on it stay exact. */
object BloomFunctions {

  /** Aggregate a LONG key column (hash wide/string keys first, e.g.
    * `xxhash64`) into a serialized bloom filter (BINARY). */
  def bloomAgg(keys: Column, estimatedItems: Long, numBits: Long): Column =
    B.column(new BloomFilterAggregate(B.expression(keys),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a [[bloomAgg]] sketch; NULL-safe like the
    * optimizer's own runtime filter (null key → null, filtered). */
  def mightContain(bloom: Column, key: Column): Column =
    B.column(BloomFilterMightContain(B.expression(bloom), B.expression(key)))
}
