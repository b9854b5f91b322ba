package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, JaccardSimilarity, JaccardSortedLongs, MinHashFromHashes, MinHashSignature, NormalizeText, SimHash64, SortedShingleHashes, WordShingles}

/** SQL-surface registration of the engine's custom Catalyst expressions —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions` on a cluster) makes them
  * callable from plain SQL:
  *
  * {{{
  * SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  * SELECT minhash_sig(shingles), simhash64(tokens), jaccard_sim(x, y) ...
  * }}} */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    e.injectOptimizerRule(_ => graft.plans.ShingleHashRewrite)
  }
}

object GraftExtensions {
  private def two(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case other => throw new IllegalArgumentException(
      s"expected 2 arguments, got ${other.size}")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim"  -> two(CosineSimilarity(_, _)),
    "dot_product" -> two(DotProduct(_, _)),
    "jaccard_sim" -> two(JaccardSimilarity(_, _)),
    "minhash_sig" -> { case Seq(a) => MinHashSignature(a, 64, 42L) },
    "minhash_sig_hashed" -> { case Seq(a) => MinHashFromHashes(a, 64, 42L) },
    // DuckDB-compatible UAX#15 normalization (byte-identical NFC output)
    "nfc_normalize" -> { case Seq(a) => NormalizeText(a, "NFC") },
    "nfkc_normalize" -> { case Seq(a) => NormalizeText(a, "NFKC") },
    "simhash64"   -> { case Seq(a) => SimHash64(a) },
    // hashed-shingle verify kernels (word 3-gram default)
    "shingles"        -> { case Seq(a) => WordShingles(a, 3, sort = false) },
    "shingle_hashes"  -> { case Seq(a) => SortedShingleHashes(a, 3) },
    "jaccard_hashed"  -> two(JaccardSortedLongs(_, _)),
    // the runtime-filter bloom sketch, callable from user SQL (the
    // analyzer wraps the bare AggregateFunction like any builtin agg)
    "bloom_agg" -> { case Seq(a, n, bits) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(a, n, bits) },
    "bloom_might_contain" -> two(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(_, _)))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ShingleHashRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ShingleHashRewrite
  }
}
