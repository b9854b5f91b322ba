package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Crawl-ingestion operators — the front end of a training-data pipeline
  * over raw web captures: HTML main-content extraction, block-level
  * boilerplate removal, URL canonicalization, and per-domain caps.
  *
  * Everything text-shaped here is a pure Column expression (regexp chains
  * and higher-order functions, no UDFs): at 100 TB these run inside
  * whole-stage codegen as a single map stage over the capture scan — the
  * scan IS the cost, extraction adds no shuffle and no materialization.
  * The only shuffling operator in the family is the per-domain cap, and
  * that one shuffles ≤ keys·k rows (bounded typed aggregation), not the
  * corpus.
  *
  * The fixtures carry no raw HTML or URLs, so the driver queries SYNTHESIZE
  * a deterministic page/URL per document (same closed-form recipe on the
  * Spark and DuckDB sides — the multimodal pattern) and then run the real
  * extraction pipeline over it; the operators themselves take any STRING
  * column.
  *
  * Cross-engine regex notes (Java regex here, RE2 in the DuckDB oracle):
  * no backreferences anywhere (RE2 lacks them — script/style are two
  * passes, not one `</(script|style)>` with a `\1`); inline flags
  * `(?is)`/`(?m)` and non-greedy `.*?` are common to both; whitespace is
  * always the explicit class (see [[TextAnalysis.WsChars]]), never `\s`.
  */
object Crawl {

  // ------------------------------------------------------- HTML extraction

  /** HTML-escape a text column (the synthesis side of the closed-form
    * fixture; `&` first so entities don't double-escape). */
  def escapeHtml(text: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(text) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }

  /** Boilerplate fragments of the synthesized page — referenced by both the
    * Spark synthesis and the oracle-SQL synthesis so they cannot drift. */
  val NavHtml: String =
    """<nav class="menu"><a href="/">Home</a> &middot; <a href="/about">About &amp; Contact</a></nav>"""
  val AdsHtml: String =
    """<div class="ads">Sponsored &copy; links</div>"""
  val FooterHtml: String =
    """<footer>&copy; 2026 example.com &mdash; All rights reserved</footer>"""

  /** Deterministic synthetic page: title + tracking script + style block +
    * nav + heading + the document text as the single content paragraph +
    * ads div + footer. Every structural hazard the extractor must handle
    * is present: script/style payloads that must vanish wholesale,
    * entities (`&amp; &middot; &copy; &mdash;`), attributes in tags, and
    * block boundaries that must become line breaks. */
  def synthHtml(docId: Column, text: Column): Column =
    concat(
      lit("<html><head><title>Doc "), docId, lit("</title>"),
      lit("""<script type="text/javascript">var doc = """), docId,
      lit("; track(doc);</script>"),
      lit("<style>.menu{color:#333} p{margin:0}</style></head><body>"),
      lit(NavHtml),
      lit("<h1>Doc "), docId, lit("</h1><p>"),
      escapeHtml(text),
      lit("</p>"), lit(AdsHtml), lit(FooterHtml), lit("</body></html>"))

  /** Decode the HTML entities the pipeline emits/encounters; `&amp;` LAST
    * (the inverse of escape order) so `&amp;copy;` stays `&copy;` text. */
  def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&copy;" -> "©", "&middot;" -> "·",
      "&mdash;" -> "—", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** HTML → plain text: drop script/style subtrees, turn block-element
    * boundaries into newlines, strip remaining tags, decode entities,
    * normalize whitespace (collapse runs, trim line edges, drop empty
    * lines). Output is newline-separated blocks — the unit the
    * boilerplate filter scores. */
  def mainContent(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle  = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val blocks   = regexp_replace(noStyle,
      "(?i)</(p|div|h1|h2|h3|nav|footer|li|tr|title|td)>|<br[^>]*>", "\n")
    val noTags   = regexp_replace(blocks, "<[^>]*>", "")
    val decoded  = decodeEntities(noTags)
    val oneSpace = regexp_replace(decoded, "[ \t]+", " ")
    val trimmed  = regexp_replace(oneSpace, "(?m)^ | $", "")
    val noEmpty  = regexp_replace(trimmed, "\n{2,}", "\n")
    trim(noEmpty, "\n")
  }

  // --------------------------------------------------- boilerplate filter

  /** Block-level boilerplate predicate (the jusText-lite heuristic): a
    * block is CONTENT if it is long (≥ [[LongBlockTokens]] tokens — long
    * runs of prose are content regardless of function words), or
    * mid-length (≥ [[MinBlockTokens]]) with a visible stopword presence
    * (≥ [[MinStopRatio]]). Nav bars, footers, and ad labels are short
    * and stopword-free, so they fail both arms. */
  val MinBlockTokens = 5
  val LongBlockTokens = 15
  val MinStopRatio = 0.04

  private def blockTokens(line: Column): Column =
    split(lower(trim(line)), TextAnalysis.WsPlus)

  /** Keep only content blocks of an extracted (newline-separated) text.
    * Returns struct(content, n_blocks, n_kept) so the caller sees both the
    * cleaned text and the cut statistics. Pure HOF (filter over split) —
    * no explode, no shuffle: block scoring rides the same codegen stage as
    * extraction. */
  def dropBoilerplate(text: Column): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, l => {
      val toks = blockTokens(l)
      val n = size(toks)
      val stop = size(filter(toks, t => t.isInCollection(TextAnalysis.EnStopwords)))
        .cast(DoubleType) / greatest(n, lit(1)).cast(DoubleType)
      n.geq(lit(LongBlockTokens)) ||
        (n.geq(lit(MinBlockTokens)) && stop.geq(lit(MinStopRatio)))
    })
    struct(
      concat_ws("\n", kept).as("content"),
      size(lines).as("n_blocks"),
      size(kept).as("n_kept"))
  }

  // ------------------------------------------------- URL canonicalization

  /** Deterministic synthetic URL per document: mixed-case scheme/host,
    * sometimes a `www.` prefix, sometimes an explicit default port (`:443`)
    * or a REAL port (`:8080` — must survive), tracking query params
    * (`utm_*`, `fbclid`) interleaved with real ones in shuffled order, and
    * sometimes a fragment. */
  def synthUrl(docId: Column): Column = {
    val scheme = when(docId % 2 === 0, lit("HTTPS://")).otherwise(lit("https://"))
    val www = when(docId % 5 === 0, lit("WWW.")).otherwise(lit(""))
    val host = when(docId % 3 === 0, lit("Example.COM:443"))
      .when(docId % 3 === 1, lit("news.example.com"))
      .otherwise(lit("Blog.example.ORG:8080"))
    val query = when(docId % 4 === 0, lit("?utm_source=feed&b=2&a=1"))
      .when(docId % 4 === 1, lit("?z=9&utm_campaign=x&a=1&fbclid=1"))
      .when(docId % 4 === 2, lit("?b=2"))
      .otherwise(lit(""))
    val frag = when(docId % 6 === 0, lit("#section-2")).otherwise(lit(""))
    concat(scheme, www, host, lit("/articles/"), docId, query, frag)
  }

  /** Canonical URL: lowercase scheme+authority, drop the fragment, drop
    * DEFAULT ports only (`:443` on https, `:80` on http), drop a leading
    * `www.`, keep the path byte-exact (paths are case-sensitive), drop
    * tracking params (`utm_*`, `fbclid`, `gclid`), and sort the surviving
    * query params so param order never splits a dedup key. Pure regex +
    * array HOFs — one codegen'd expression, the standard pre-dedup step
    * for crawl URLs. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val head0 = lower(regexp_extract(noFrag, "^([^/?#]+//[^/?#]+)", 1))
    val head1 = regexp_replace(head0, "^(https://[^:/]+):443$", "$1")
    val head2 = regexp_replace(head1, "^(http://[^:/]+):80$", "$1")
    val head = regexp_replace(head2, "^(https?://)www\\.", "$1")
    val path = regexp_extract(noFrag, "^[^/?#]+//[^/?#]+([^?#]*)", 1)
    val qs = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(split(qs, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)="))
    val sortedQ = array_sort(params)
    val q = when(size(sortedQ) > 0, concat(lit("?"), concat_ws("&", sortedQ)))
      .otherwise(lit(""))
    concat(head, path, q)
  }

  /** Registered domain of a canonical URL — the last two host labels
    * (`news.example.com` → `example.com`). The per-domain key for caps,
    * robots grouping, and source mixing. */
  def registeredDomain(url: Column): Column = {
    val host = regexp_extract(url, "^[^/?#]+//([^/?#:]+)", 1)
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  // ---------------------------------------------------- per-domain caps

  /** Keep the k best documents per domain (score desc, id asc). Uses the
    * bounded [[graft.functions.TopKAggregator]]: each map task reduces its
    * slice to ≤ k rows per domain BEFORE the exchange, so the shuffle
    * carries ≤ domains·k rows — the window row_number formulation (the
    * oracle twin) would shuffle the whole corpus to per-domain partitions
    * and hit the giant-domain skew wall at 100 TB. Output: (domain, rank,
    * id, score). */
  def domainCap(docs: DataFrame, domainCol: String, idCol: String,
                scoreCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k).toColumn
    docs.select(col(domainCol), col(idCol), col(scoreCol))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .flatMap { case (domain, top) =>
        top.iterator.zipWithIndex.map { case ((score, id), i) =>
          (domain, i + 1, id, score)
        }
      }
      .toDF(domainCol, "rank", idCol, scoreCol)
  }

  // ------------------------------------------- corpus-frequency line dedup

  /** CORPUS-FREQUENCY line dedup — the CCNet/Dolma cleaning pass the
    * per-document jusText heuristics cannot express: a line occurring in
    * ≥ `minDocs` DISTINCT documents (cookie banners, subscribe prompts,
    * navigation rendered as text) is boilerplate BY REPETITION and is
    * dropped from every document; document-local structure (line order,
    * blank lines, unique lines) survives untouched.
    *
    * Scale shape: one posexplode over the corpus; the hot-line table is
    * a (normalized-line) aggregation with map-side partial counts; the
    * hot mark is an UNHINTED join — hot lines are few at any corpus size
    * (AQE broadcasts) but the normalized-line key space is unbounded, so
    * nothing forces a driver-sized build. Reassembly is a per-document
    * bounded collect (a document's own lines), ordered by the exploded
    * position — no window, no corpus-wide sort.
    *
    * Normalization for counting is lower(trim(line)); empty-after-trim
    * lines are never counted (they'd be "hot" in any corpus and blank
    * structure is not boilerplate). NULL text coalesces to the empty
    * document (one empty line) — posexplode of a NULL split would
    * otherwise drop the document's output row entirely. Output:
    * (idCol, n_lines, n_dropped, text_clean). */
  def dropRepeatedLines(docs: DataFrame, textCol: String, idCol: String,
                        minDocs: Long): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .withColumn("key", lower(trim(col("line"))))
    val hot = lines.filter(length(col("key")) > 0)
      .groupBy("key").agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("key"), lit(true).as("__hot"))
    lines.join(hot, Seq("key"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__hot"), 1L).otherwise(0L)).as("n_dropped"),
        // collect_list skips nulls: hot lines vanish before the per-doc
        // sort, so the collect is bounded by the document's own lines
        array_join(transform(
          array_sort(collect_list(
            when(col("__hot").isNull, struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("text_clean"))
  }
}
