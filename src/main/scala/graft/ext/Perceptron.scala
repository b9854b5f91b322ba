package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a linear text classifier — full-batch
  * perceptron over hashing-trick features, in PURE INTEGER arithmetic.
  *
  * Why a perceptron and why integers: the point of this operator is that
  * TRAINING ITSELF is reproducible to the bit on any engine, any cluster
  * size, any partition layout. Gradient methods need a sigmoid/exp and
  * float accumulation whose result depends on reduction order; the
  * perceptron update (`w += Σ_mislabeled y·x`) is a sum of integers —
  * associative, commutative, engine-exact — so the DuckDB oracle can
  * replay every iteration and hash-match the learned weights. The price
  * (no calibrated probabilities) doesn't matter for corpus routing, where
  * the sign and a margin ordering are what's consumed.
  *
  * Scale shape per iteration: margins = one broadcast join of the
  * `Dim`-row weight table against per-(doc, bucket) counts + one groupBy
  * doc; updates = one groupBy bucket over the mislabeled rows; the ONLY
  * driver state is the `Dim`-long weight vector (same contract as the
  * k-means quantizer). The corpus is tokenized once into per-(doc,
  * bucket) counts and reused across iterations via localCheckpoint. */
object Perceptron {

  val Dim = 64

  /** Per-(doc, bucket) integer features + {+1,-1} label. */
  def features(docs: DataFrame, textCol: String, idCol: String,
               labelExpr: String): DataFrame =
    docs.select(col(idCol),
        when(expr(labelExpr), 1L).otherwise(-1L).as("y"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("b", TextAnalysis.tokenBucket(col("token"), Dim))
      .groupBy(col(idCol), col("y"), col("b"))
      .agg(count(lit(1)).as("n"))

  /** Mislabel test, mirrored verbatim in the SQL oracles: predict +1 iff
    * margin > 0 (zero margin predicts −1, so a y=−1 doc with m=0 is
    * CORRECT — `y·m ≤ 0` would wrongly flag it). */
  private def mislabeled(y: Column, m: Column): Column =
    (y > 0 && m <= 0) || (y < 0 && m > 0)

  /** Train `iters` full-batch epochs from w = 0. Returns the weight table
    * over the buckets present in the corpus (absent buckets are zero on
    * both engines by construction): (b, w). */
  def train(docs: DataFrame, textCol: String, idCol: String,
            labelExpr: String, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feat = features(docs, textCol, idCol, labelExpr).localCheckpoint()
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to iters) {
      // the weight vector rides in the expression literal itself (a map
      // literal, codegen'd); no broadcast handle to leak across epochs
      val wCol = udfFreeLookup(w)
      val margins = feat
        .withColumn("wb", wCol(col("b")))
        .groupBy(col(idCol), col("y"))
        .agg(sum(expr("n * wb")).as("m"))
      val upd = margins.filter(mislabeled(col("y"), col("m")))
        .select(col(idCol).as("__mid"))
        .join(feat, col("__mid") === feat(idCol))
        .groupBy("b").agg(sum(expr("y * n")).as("d"))
        .as[(Long, Long)].collect() // ≤ Dim rows
      w = upd.foldLeft(w) { case (acc, (b, d)) => acc.updated(b, acc(b) + d) }
    }
    val wSeq = w.toSeq
    val wDf =
      if (wSeq.isEmpty) Seq.empty[(Long, Long)].toDF("b", "w")
      else wSeq.toDF("b", "w")
    feat.select(col("b")).distinct()
      .join(broadcast(wDf), Seq("b"), "left")
      .select(col("b"), coalesce(col("w"), lit(0L)).as("w"))
  }

  /** The Dim-entry weight vector as a CASE-free expression: a literal
    * map lookup via element_at on a map literal (codegen'd, no UDF). */
  private def udfFreeLookup(w: Map[Long, Long]): Column => Column = {
    if (w.isEmpty) (_: Column) => lit(0L)
    else {
      val entries = w.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      val m = map(entries: _*)
      (b: Column) => coalesce(element_at(m, b), lit(0L))
    }
  }

  /** Score the corpus with a weight table: per-doc margin, prediction,
    * label, correctness. `weights` is broadcast (Dim rows). */
  def predict(docs: DataFrame, textCol: String, idCol: String,
              labelExpr: String, weights: DataFrame): DataFrame =
    features(docs, textCol, idCol, labelExpr)
      .join(broadcast(weights), Seq("b"), "left")
      .groupBy(col(idCol), col("y"))
      .agg(sum(expr("n * coalesce(w, 0)")).as("m"))
      .select(col(idCol), col("y"), col("m"),
        (col("m") > 0).as("pred_pos"),
        (!mislabeled(col("y"), col("m"))).as("correct"))

  // ------------------------------------------------------------- multiclass

  /** Per-(doc, bucket) features keyed by the doc's TRUE class. */
  def multiFeatures(docs: DataFrame, textCol: String, idCol: String,
                    classCol: String): DataFrame =
    docs.select(col(idCol), col(classCol).as("cls"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("b", TextAnalysis.tokenBucket(col("token"), Dim))
      .groupBy(col(idCol), col("cls"), col("b"))
      .agg(count(lit(1)).as("n"))

  /** One-vs-rest multiclass training — ALL class heads train
    * simultaneously: the class is just one more grouping column, so an
    * epoch is still two aggregates (margins per (doc, class), updates per
    * (class, bucket)) regardless of how many classes exist, and the
    * driver state is |classes|·Dim longs. Same integer-exactness contract
    * as the binary trainer: y·x updates are order-free sums, the oracle
    * replays every epoch. Returns (c, b, w) over classes × corpus
    * buckets. */
  def trainMulticlass(docs: DataFrame, textCol: String, idCol: String,
                      classCol: String, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feat = multiFeatures(docs, textCol, idCol, classCol).localCheckpoint()
    val ids = feat.select(col(idCol), col("cls")).distinct().localCheckpoint()
    val classes = ids.select("cls").distinct().as[String].collect().sorted.toSeq
    var w = Map.empty[(String, Long), Long].withDefaultValue(0L)
    for (_ <- 1 to iters) {
      val wDf =
        if (w.isEmpty) Seq.empty[(String, Long, Long)].toDF("c", "b", "w")
        else w.toSeq.map { case ((c, b), v) => (c, b, v) }.toDF("c", "b", "w")
      val partial = feat.join(broadcast(wDf), feat("b") === wDf("b"))
        .groupBy(col(idCol), col("c"))
        .agg(sum(expr("n * w")).as("pm"))
      val margins = ids
        .crossJoin(broadcast(classes.toDF("c")))
        .join(partial, Seq(idCol, "c"), "left")
        .select(col(idCol), col("cls"), col("c"),
          coalesce(col("pm"), lit(0L)).as("m"),
          when(col("cls") === col("c"), 1L).otherwise(-1L).as("y"))
      val upd = margins.filter(mislabeled(col("y"), col("m")))
        .select(col(idCol).as("__mid"), col("c"), col("y"))
        .join(feat, col("__mid") === feat(idCol))
        .groupBy("c", "b").agg(sum(expr("y * n")).as("d"))
        .as[(String, Long, Long)].collect() // ≤ |classes| · Dim rows
      w = upd.foldLeft(w) { case (acc, (c, b, d)) =>
        acc.updated((c, b), acc((c, b)) + d)
      }
    }
    val wDf =
      if (w.isEmpty) Seq.empty[(String, Long, Long)].toDF("c", "b", "w")
      else w.toSeq.map { case ((c, b), v) => (c, b, v) }.toDF("c", "b", "w")
    feat.select("b").distinct()
      .crossJoin(broadcast(classes.toDF("c")))
      .join(broadcast(wDf), Seq("c", "b"), "left")
      .select(col("c"), col("b"), coalesce(col("w"), lit(0L)).as("w"))
  }

  /** Confusion matrix of the argmax head (ties break to the
    * lexicographically first class — mirrored in the oracle): (y_true,
    * y_pred, n). */
  def confusion(docs: DataFrame, textCol: String, idCol: String,
                classCol: String, weights: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val feat = multiFeatures(docs, textCol, idCol, classCol).localCheckpoint()
    val ids = feat.select(col(idCol), col("cls")).distinct()
    val classes = weights.select("c").distinct()
    val partial = feat.join(broadcast(weights), feat("b") === weights("b"))
      .groupBy(col(idCol), col("c"))
      .agg(sum(expr("n * w")).as("pm"))
    val margins = ids.crossJoin(broadcast(classes))
      .join(partial, Seq(idCol, "c"), "left")
      .select(col(idCol), col("cls"), col("c"),
        coalesce(col("pm"), lit(0L)).as("m"))
    margins
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("m").desc, col("c"))))
      .filter(col("rk") === 1)
      .groupBy(col("cls").as("y_true"), col("c").as("y_pred"))
      .agg(count(lit(1)).as("n"))
  }
}
