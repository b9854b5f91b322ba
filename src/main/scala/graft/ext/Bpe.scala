package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (the merge-table learning step of
  * byte-pair encoding — Sennrich et al. 2016, the public algorithm behind
  * GPT/LLaMA-style tokenizers).
  *
  * Scale shape — the key observation that makes corpus-scale BPE cheap:
  * the trainer never touches the corpus after ONE aggregation. Pass 1
  * collapses the corpus to the DISTINCT-WORD table (word, freq) — one
  * map-side-combined shuffle over the text, output bounded by vocabulary
  * (~10⁷ rows at web scale), not corpus size. Every merge iteration then
  * runs on that bounded table: adjacent-pair counts weighted by word
  * frequency (one small groupBy), an argmax of ONE row to the driver, and
  * a map applying the merge to each word's symbol sequence. k merges = k
  * bounded shuffles; the 100 TB of text is read exactly once.
  *
  * The symbol-sequence rewrite is genuine per-row imperative logic
  * (greedy left-to-right non-overlapping replacement), so it lives in a
  * typed Dataset.map rather than a fought-into-shape expression — the
  * documented escape hatch for per-row algorithms. localCheckpoint per
  * iteration truncates the k-deep lineage.
  */
object Bpe {

  /** Corpus → distinct-word frequency table: one aggregation, the only
    * pass that sees the corpus. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right non-overlapping merge of adjacent (l, r) —
    * standard BPE application order. */
  def mergePair(syms: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Learn the first `k` merges. Returns (rank, left, right, n) — the
    * merge table in learned order. Ties on count break by (left, right)
    * so the sequence is deterministic on any engine or cluster size. */
  def merges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString).toSeq: Seq[String], f) }
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var it = 0
    var done = false
    while (it < k && !done) {
      val best = pairCountsOf(words)
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, n) = best.head
        learned += ((it + 1, l, r, n))
        val old = words
        words = words.map { case (syms, f) =>
          (mergePair(syms.toIndexedSeq, l, r): Seq[String], f)
        }.localCheckpoint()
        old.unpersist()
        it += 1
      }
    }
    spark.createDataset(learned.toSeq)
      .toDF("rank", "left", "right", "n")
  }

  private def pairCountsOf(words: Dataset[(Seq[String], Long)]): DataFrame = {
    import words.sparkSession.implicits._
    words.flatMap { case (syms, f) =>
      syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, f) }
    }.toDF("left", "right", "f")
      .groupBy("left", "right").agg(sum("f").as("n"))
  }

  /** First-iteration adjacent-pair counts as columns — the
    * oracle-checkable face of the trainer (everything past iteration 1
    * depends on the argmax loop, which SQL can't express without
    * recursion). */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val pairs = wordCounts(docs, textCol)
      .filter(length(col("word")) > 1)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1), " +
          "i -> struct(substr(word, i, 1) AS left, substr(word, i + 1, 1) AS right))"))
        .as("p"))
    pairs.groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum("freq").as("n"))
  }

  /** Separator-guarded symbol string: "abc" → "·a·b·c·". Every symbol is
    * ·-bounded and symbols never contain '·', so a substring match can only
    * align on symbol boundaries. */
  val Sep = "·"

  /** Encode a word column with a learned merge table — NO per-row code:
    * each merge is one `regexp_replace` whose separators are LOOKAROUND
    * guards, `(?<=·)l·r(?=·)` → `lr`. The guards anchor matches to symbol
    * boundaries without consuming the separators, so a run like
    * `·a·a·a·a·` merges to `·aa·aa·` exactly as greedy left-to-right BPE
    * does (a consuming `·l·r·` pattern would eat the boundary separator
    * and skip every second pair of a run — caught by BpeSpec). The whole
    * encode is a chain of k string expressions over the vocabulary-bounded
    * distinct-word table. Returns the encoded symbol COUNT. */
  /** The ·-guarded symbol string after all merges — shared by the length
    * and vocabulary paths. */
  def encodedString(word: org.apache.spark.sql.Column,
                    merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import java.util.regex.{Matcher, Pattern}
    val guarded = concat(lit(Sep),
      regexp_replace(word, "(?<=.)(?=.)", Sep), lit(Sep))
    merges.foldLeft(guarded) { case (acc, (l, r)) =>
      regexp_replace(acc,
        "(?<=" + Pattern.quote(Sep) + ")" + Pattern.quote(l + Sep + r) +
          "(?=" + Pattern.quote(Sep) + ")",
        Matcher.quoteReplacement(l + r))
    }
  }

  def encodedLen(word: org.apache.spark.sql.Column,
                 merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val end = encodedString(word, merges)
    // symbols = separators - 1
    (length(end) - length(call_function("replace", end, lit(Sep), lit(""))) - 1)
      .cast("long")
  }

  /** The trained tokenizer's VOCABULARY: every surviving symbol after k
    * merges, with its corpus occurrence count and the number of distinct
    * words it appears in. Runs entirely on the vocabulary-bounded
    * distinct-word table through the expression-chain encode (split the
    * guarded string on the separator); the imperative mergePair fold is
    * the independent replay used by the `_verified` companion. */
  def vocab(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = merges(docs, textCol, k)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
    wordCounts(docs, textCol)
      .select(col("word"), col("freq"), explode(filter(
        split(encodedString(col("word"), table), java.util.regex.Pattern.quote(Sep)),
        s => length(s) > 0)).as("symbol"))
      .groupBy("symbol")
      // countDistinct, not count: a symbol occurring twice in one word
      // contributes two occurrence rows but one word
      .agg(sum("freq").as("n_uses"), countDistinct("word").as("n_words"))
  }

  /** Per-document BPE token accounting: learn k merges, encode the
    * DISTINCT-word table once (vocabulary-bounded, pure expressions), and
    * broadcast-join the encoded lengths back to the corpus tokens. Output:
    * whitespace tokens, BPE tokens, characters, and an integer compression
    * ratio — the fertility numbers a tokenizer evaluation reports. */
  def encodeCounts(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = merges(docs, textCol, k)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
    val toks = docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val vocab = toks.select("word").distinct()
      .withColumn("n_bpe", encodedLen(col("word"), table))
      .withColumn("n_chars", length(col("word")).cast("long"))
    // no broadcast hint: the distinct-word table is small at bench scale
    // (AQE still turns this into a broadcast join at runtime) but grows
    // with the corpus under Heaps' law — a FORCED broadcast would OOM at
    // 100 TB where a shuffle join is the only correct shape
    toks.join(vocab, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ws_tokens"),
        sum("n_bpe").as("n_bpe_tokens"),
        sum("n_chars").as("n_chars"))
      .withColumn("chars_per_token_x1000",
        expr("(n_chars * 1000) div n_bpe_tokens"))
  }

  /** Driver-side reference implementation for the `_verified` contract
    * companion: the same algorithm on a collected word map, sequentially.
    * Test-scale only (the distributed path is the product). */
  def referenceMerges(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var table: Map[Seq[String], Long] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toSeq, f) }
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var it = 0
    var done = false
    while (it < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        learned += ((it + 1, l, r, n))
        table = table.toSeq.map { case (syms, f) =>
          (mergePair(syms.toIndexedSeq, l, r): Seq[String], f)
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        it += 1
      }
    }
    learned.toSeq
  }
}
