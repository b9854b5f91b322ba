package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Crawl, TextAnalysis}

/** Driver-checked queries for the crawl-ingestion family: HTML main-content
  * extraction, block-level boilerplate removal, URL canonicalization, and
  * per-domain caps. The fixtures carry no HTML/URLs, so each query
  * synthesizes them deterministically from `documents` (the multimodal
  * closed-form-oracle pattern) and runs the REAL operators over the result;
  * the DuckDB oracle re-synthesizes with the same recipe and mirrors every
  * regex in RE2 form. */
object CrawlQueries {

  /** DuckDB-side synthesis of [[Crawl.synthHtml]] — interpolates the SAME
    * boilerplate constants so the two sides cannot drift. */
  private val htmlSql: String =
    "'<html><head><title>Doc ' || doc_id || '</title>" +
      "<script type=\"text/javascript\">var doc = ' || doc_id || '; track(doc);</script>" +
      "<style>.menu{color:#333} p{margin:0}</style></head><body>" +
      Crawl.NavHtml.replace("'", "''") +
      "<h1>Doc ' || doc_id || '</h1><p>' || " +
      "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')" +
      " || '</p>" + Crawl.AdsHtml + Crawl.FooterHtml + "</body></html>'"

  /** DuckDB-side twin of [[Crawl.mainContent]] over a column named `html`:
    * same passes, RE2 flavor, explicit 'g' flag (DuckDB replaces first
    * match only by default — Spark is global by default). */
  private val contentSql: String = {
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "''",
      "&nbsp;" -> " ", "&copy;" -> "©", "&middot;" -> "·",
      "&mdash;" -> "—", "&amp;" -> "&")
    val decoded = entities.foldLeft("e4") { case (acc, (from, to)) =>
      s"replace($acc, '$from', '$to')"
    }
    s"""trim(regexp_replace(regexp_replace(regexp_replace($decoded,
       |  '[ \\t]+', ' ', 'g'),
       |  '(?m)^ | $$', '', 'g'),
       |  '\\n{2,}', chr(10), 'g'), chr(10))""".stripMargin
  }

  private val e4Sql: String =
    """regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      |  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |  '(?i)</(p|div|h1|h2|h3|nav|footer|li|tr|title|td)>|<br[^>]*>', chr(10), 'g'),
      |  '<[^>]*>', '', 'g')""".stripMargin

  // ------------------------------------------------------ q_html_extract

  /** End-to-end main-content extraction over synthesized pages; the full
    * chain (script/style removal, block boundaries, tag strip, entity
    * decode, whitespace normalization) is one codegen'd projection. */
  def qHtmlExtract(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"),
      Crawl.mainContent(Crawl.synthHtml(col("doc_id"), col("text"))).as("content"))
      .withColumn("n_chars", length(col("content")))
  }

  val qHtmlExtractSql: String =
    s"""WITH h AS (SELECT doc_id, $htmlSql AS html FROM documents),
       |e AS (SELECT doc_id, $e4Sql AS e4 FROM h)
       |SELECT doc_id, $contentSql AS content,
       |  length($contentSql) AS n_chars
       |FROM e""".stripMargin

  // ------------------------------------------------------- q_html_boiler

  /** Extraction + jusText-lite boilerplate drop: newline-delimited blocks
    * scored by length and stopword presence, nav/footer/ads cut. */
  def qHtmlBoiler(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"),
      Crawl.dropBoilerplate(
        Crawl.mainContent(Crawl.synthHtml(col("doc_id"), col("text")))).as("b"))
      .select(col("doc_id"), col("b.content").as("content"),
        col("b.n_blocks").as("n_blocks"), col("b.n_kept").as("n_kept"))
  }

  private val swList = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")
  private val wsRe = "[ \\t\\n\\f\\r]+"

  val qHtmlBoilerSql: String = {
    val toks = s"string_split_regex(lower(trim(l)), '$wsRe')"
    val keepPred =
      s"""len($toks) >= ${Crawl.LongBlockTokens} OR (
         |      len($toks) >= ${Crawl.MinBlockTokens} AND
         |      len(list_filter($toks, t -> t IN ($swList)))::DOUBLE
         |        / greatest(len($toks), 1) >= ${Crawl.MinStopRatio})""".stripMargin
    s"""WITH h AS (SELECT doc_id, $htmlSql AS html FROM documents),
       |e AS (SELECT doc_id, $e4Sql AS e4 FROM h),
       |x AS (SELECT doc_id, $contentSql AS content FROM e),
       |s AS (SELECT doc_id, string_split(content, chr(10)) AS lines FROM x),
       |k AS (SELECT doc_id, lines,
       |  list_filter(lines, l -> $keepPred) AS kept FROM s)
       |SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS content,
       |  len(lines) AS n_blocks, len(kept) AS n_kept
       |FROM k""".stripMargin
  }

  // --------------------------------------------------------- q_url_canon

  /** URL canonicalization over synthesized crawl URLs: lowercased
    * authority, default ports and `www.` and tracking params dropped,
    * surviving params sorted, fragment cut; plus the registered domain. */
  def qUrlCanon(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val raw = Crawl.synthUrl(col("doc_id"))
    val canon = Crawl.canonicalizeUrl(raw)
    d.select(col("doc_id"), raw.as("raw"), canon.as("canon"),
      Crawl.registeredDomain(canon).as("domain"))
  }

  /** DuckDB-side twin of [[Crawl.synthUrl]]. */
  private val urlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END) ||
      |  (CASE doc_id % 3 WHEN 0 THEN 'Example.COM:443' WHEN 1 THEN 'news.example.com'
      |        ELSE 'Blog.example.ORG:8080' END) ||
      |  '/articles/' || doc_id ||
      |  (CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&b=2&a=1'
      |        WHEN 1 THEN '?z=9&utm_campaign=x&a=1&fbclid=1'
      |        WHEN 2 THEN '?b=2' ELSE '' END) ||
      |  (CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)""".stripMargin

  /** RE2 twin of [[Crawl.canonicalizeUrl]] + [[Crawl.registeredDomain]]
    * (replacement backrefs are `\1` in DuckDB vs Java's `$1`). */
  private val canonCteSql: String =
    s"""u AS (SELECT doc_id, $urlSql AS raw FROM documents),
       |n AS (SELECT doc_id, raw, regexp_replace(raw, '#.*$$', '') AS nofrag FROM u),
       |p AS (SELECT doc_id, raw,
       |  regexp_replace(regexp_replace(regexp_replace(
       |    lower(regexp_extract(nofrag, '^([^/?#]+//[^/?#]+)', 1)),
       |    '^(https://[^:/]+):443$$', '\\1'), '^(http://[^:/]+):80$$', '\\1'),
       |    '^(https?://)www\\.', '\\1') AS head,
       |  regexp_extract(nofrag, '^[^/?#]+//[^/?#]+([^?#]*)', 1) AS path,
       |  regexp_extract(nofrag, '\\?([^#]*)', 1) AS qs FROM n),
       |q AS (SELECT doc_id, raw, head, path,
       |  list_sort(list_filter(string_split(qs, '&'),
       |    x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)='))) AS ps
       | FROM p),
       |c AS (SELECT doc_id, raw,
       |  head || path || (CASE WHEN len(ps) > 0
       |    THEN '?' || array_to_string(ps, '&') ELSE '' END) AS canon FROM q)""".stripMargin

  val qUrlCanonSql: String =
    s"""WITH $canonCteSql
       |SELECT doc_id, raw, canon,
       |  regexp_extract(regexp_extract(canon, '^[^/?#]+//([^/?#:]+)', 1),
       |    '([^.]+\\.[^.]+)$$', 1) AS domain
       |FROM c""".stripMargin

  // -------------------------------------------------------- q_domain_cap

  /** Keep the 50 best documents per registered domain by quality score —
    * the bounded typed-aggregation path (shuffle ≤ domains·k rows); the
    * oracle is the window row_number twin. */
  def qDomainCap(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val canon = Crawl.canonicalizeUrl(Crawl.synthUrl(col("doc_id")))
    val scored = d.select(
      Crawl.registeredDomain(canon).as("domain"),
      col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    Crawl.domainCap(scored, "domain", "doc_id", "quality", k = 50)
  }

  val qDomainCapSql: String =
    s"""WITH $canonCteSql,
       |d AS (SELECT doc_id,
       |  regexp_extract(regexp_extract(canon, '^[^/?#]+//([^/?#:]+)', 1),
       |    '([^.]+\\.[^.]+)$$', 1) AS domain, text
       | FROM c JOIN documents USING (doc_id)),
       |t AS (SELECT doc_id, domain,
       |  string_split_regex(lower(trim(text)), '$wsRe') AS toks, text FROM d),
       |m AS (SELECT doc_id, domain,
       |  len(toks) AS n_tokens,
       |  len(regexp_extract_all(lower(text), '[^a-z0-9 \\t\\n\\f\\r]'))::DOUBLE
       |    / greatest(length(text), 1) AS punct_ratio,
       |  len(list_filter(toks, x -> x IN ($swList)))::DOUBLE
       |    / greatest(len(toks), 1) AS stopword_ratio,
       |  list_sum(list_transform(toks, x -> length(x)))::DOUBLE
       |    / greatest(len(toks), 1) AS mean_token_len
       | FROM t),
       |sc AS (SELECT doc_id, domain,
       |  0.3 * (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END)
       |  + 0.2 * (CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
       |  + 0.3 * (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END)
       |  + 0.2 * (1.0 - least(punct_ratio * 5.0, 1.0)) AS quality
       | FROM m),
       |r AS (SELECT domain, doc_id, quality,
       |  row_number() OVER (PARTITION BY domain ORDER BY quality DESC, doc_id) AS rank
       | FROM sc)
       |SELECT domain, rank, doc_id, quality FROM r WHERE rank <= 50""".stripMargin

  // ------------------------------------------------------- q_line_dedup

  /** Corpus-frequency line dedup ([[Crawl.dropRepeatedLines]] — the
    * CCNet/Dolma boilerplate-by-repetition pass): documents are shaped
    * into multi-line pages with injected repeated lines (a cookie banner
    * on every page, a subscribe prompt on half, a unique ref line on
    * every seventh), and lines in ≥ 100 distinct docs are dropped —
    * exactly the two injected banners at sf0.01, never the body text or
    * the unique lines. The oracle replays the shaping and the
    * count/filter/reassemble arithmetic; line order and blank structure
    * must survive byte-identically. */
  def qLineDedup(s: SparkSession, dir: String): DataFrame = {
    val shaped = Tables(s, dir, "documents").select(col("doc_id"),
      concat_ws("\n",
        lit("Cookie notice: We use cookies"),
        col("text"),
        when(col("doc_id") % 2 === 0, lit("Subscribe to our newsletter")),
        when(col("doc_id") % 7 === 0,
          concat(lit("ref "), col("doc_id")))).as("text"))
    Crawl.dropRepeatedLines(shaped, "text", "doc_id", minDocs = 100L)
  }

  val qLineDedupSql: String =
    """WITH shaped AS (SELECT doc_id,
      |  concat_ws(chr(10),
      |    'Cookie notice: We use cookies',
      |    text,
      |    CASE WHEN doc_id % 2 = 0 THEN 'Subscribe to our newsletter' END,
      |    CASE WHEN doc_id % 7 = 0 THEN 'ref ' || doc_id END) AS text
      |  FROM documents),
      |sp AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM shaped),
      |l AS (SELECT doc_id, i AS pos, lines[i + 1] AS line,
      |    lower(trim(lines[i + 1])) AS key
      |  FROM sp, UNNEST(range(0, len(lines))) AS t(i)),
      |hot AS (SELECT key FROM l WHERE length(key) > 0
      |  GROUP BY key HAVING count(DISTINCT doc_id) >= 100)
      |SELECT l.doc_id,
      |  count(*)::BIGINT AS n_lines,
      |  sum(CASE WHEN hot.key IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
      |  coalesce(array_to_string(
      |    list(l.line ORDER BY l.pos) FILTER (WHERE hot.key IS NULL),
      |    chr(10)), '') AS text_clean
      |FROM l LEFT JOIN hot ON l.key = hot.key
      |GROUP BY l.doc_id""".stripMargin

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> (qHtmlExtract _),
    "q_html_boiler"  -> (qHtmlBoiler _),
    "q_url_canon"    -> (qUrlCanon _),
    "q_domain_cap"   -> (qDomainCap _),
    "q_line_dedup"   -> (qLineDedup _))

  val oracle: Map[String, String] = Map(
    "q_html_extract" -> qHtmlExtractSql,
    "q_html_boiler"  -> qHtmlBoilerSql,
    "q_url_canon"    -> qUrlCanonSql,
    "q_domain_cap"   -> qDomainCapSql,
    "q_line_dedup"   -> qLineDedupSql)
}
