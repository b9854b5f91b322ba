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

  // ------------------------------------------------------ q_curation_e2e

  /** The END-TO-END CURATION CAPSTONE — the pipeline a real user runs,
    * as ONE driver entry so the COMPOSITION (column contracts flowing
    * stage to stage, one job graph) is what the oracle certifies, not
    * the stages individually (each is separately green):
    *
    *  1. crawl shaping + corpus-frequency line dedup
    *     ([[graft.ext.Crawl.dropRepeatedLines]], the q_line_dedup
    *     boilerplate planting);
    *  2. quality + language-ID filter over the CLEANED text
    *     ([[TextAnalysis.qualityScore]]/[[TextAnalysis.langId]] —
    *     quality ≥ 0.7, ≥ 20 tokens, identified language);
    *  3. near-duplicate removal blocked by PREDICTED language: the
    *     lossless prefix-filtered exact-Jaccard pair generator →
    *     connected components → min-id representatives
    *     ([[graft.ext.Dedup.prefixJaccardPairs]]/[[graft.ext.Dedup
    *     .clusters]]; the LSH candidate twin of this stage is certified
    *     by q_dedup_clusters + its companion);
    *  4. stride-scheduled language mixture over the survivors (en 5 :
    *     zh 2 : rest 1 — the q_mixture_schedule arithmetic, keyed by
    *     lang_pred);
    *  5. token-budget shard manifest in SCHEDULE order with an
    *     order-sensitive checksum — one wrong row anywhere upstream
    *     moves a position and breaks a shard checksum.
    *
    * Every rank/prefix runs through the two-phase [[graft.exec.Ranks]]
    * utilities (never a single-task window); the survivor frame is
    * checkpointed once for its three consumers (pair generation,
    * representative semi-join, mixture). The oracle replays all five
    * stages in one CTE chain, so a hash-pass proves the composition —
    * not just each stage — exact. */
  def qCurationE2e(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.{Dedup, Sharding}
    val docs = Tables(s, dir, "documents")
    val shaped = docs.select(col("doc_id"),
      concat_ws("\n",
        lit("Cookie notice: We use cookies"),
        col("text"),
        when(col("doc_id") % 2 === 0, lit("Subscribe to our newsletter")),
        when(col("doc_id") % 7 === 0,
          concat(lit("ref "), col("doc_id")))).as("text"))
    val cleaned = Crawl.dropRepeatedLines(shaped, "text", "doc_id",
      minDocs = 100L)
    val filtered = cleaned
      .select(col("doc_id"), col("text_clean").as("text"))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .filter(col("quality") >= 0.7 && col("n_tokens") >= 20 &&
        col("lang_pred") =!= "und")
      .localCheckpoint()
    val pairs = Dedup.prefixJaccardPairs(filtered, "text", "doc_id",
      "lang_pred", threshold = 0.5)
    val cl = Dedup.clusters(filtered.select(col("doc_id").as("id")), pairs)
    val reps = filtered.join(
      cl.filter(col("id") === col("cluster")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val mix = reps.select(col("doc_id"), col("lang_pred"), col("n_tokens"))
      .withColumn("h", Sharding.shuffleKey(col("doc_id"), 42L))
      .withColumn("w10",
        expr("CASE lang_pred WHEN 'en' THEN 5 WHEN 'zh' THEN 2 ELSE 1 END"))
    val ranked = graft.exec.Ranks.groupedRowNumber(
        mix, Seq("lang_pred"), Seq(col("h"), col("doc_id")), "dom_rank")
      .withColumn("stride_key", expr("(dom_rank * 10000) div w10"))
    val positioned = graft.exec.Ranks.globalRowNumber(
      ranked, Seq(col("stride_key"), col("lang_pred"), col("dom_rank")), "pos")
    val cum = graft.exec.Ranks.groupedPrefixSum(positioned, Seq.empty,
        Seq(col("pos")), "n_tokens", "cum_before")
      .withColumn("shard", expr("cum_before div 4000"))
    cum.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      min("cum_before").as("start_tok"),
      max(expr("cum_before + n_tokens")).as("end_tok"),
      sum(expr(s"(doc_id * pos) % ${Sharding.HashMod}")).as("checksum"))
  }

  /** The five-stage replay in one CTE chain (each fragment is the
    * corresponding single-stage oracle's, re-rooted on the previous
    * stage's output). */
  val qCurationE2eSql: String = {
    val swList = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")
    val langScore = TextAnalysis.LangMarkers.map { case (l, ms) =>
      val lst = ms.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, x -> x IN ($lst))) AS s_$l"
    }.mkString(",\n  ")
    val m = graft.ext.Sharding.HashMod
    val a = graft.ext.Sharding.HashMulA
    val b = graft.ext.Sharding.HashMulB
    s"""WITH RECURSIVE shaped AS (SELECT doc_id,
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
       |  GROUP BY key HAVING count(DISTINCT doc_id) >= 100),
       |cl AS (SELECT l.doc_id,
       |  coalesce(array_to_string(
       |    list(l.line ORDER BY l.pos) FILTER (WHERE hot.key IS NULL),
       |    chr(10)), '') AS text
       |  FROM l LEFT JOIN hot ON l.key = hot.key
       |  GROUP BY l.doc_id),
       |t AS (SELECT doc_id, text,
       |  string_split_regex(lower(trim(text)), '[ \\t\\n\\f\\r]+') AS toks
       |  FROM cl),
       |mq AS (SELECT doc_id, len(toks) AS n_tokens,
       |  len(regexp_extract_all(lower(text), '[^a-z0-9 \\t\\n\\f\\r]'))::DOUBLE
       |    / greatest(length(text), 1) AS punct_ratio,
       |  len(list_filter(toks, x -> x IN ($swList)))::DOUBLE
       |    / greatest(len(toks), 1) AS stopword_ratio,
       |  list_sum(list_transform(toks, x -> length(x)))::DOUBLE
       |    / greatest(len(toks), 1) AS mean_token_len
       |FROM t),
       |qs AS (SELECT doc_id, n_tokens FROM mq WHERE n_tokens >= 20 AND
       |  0.3 * (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END)
       |  + 0.2 * (CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
       |  + 0.3 * (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END)
       |  + 0.2 * (1.0 - least(punct_ratio * 5.0, 1.0)) >= 0.7),
       |lg AS (SELECT doc_id, $langScore FROM t),
       |lp AS (SELECT doc_id,
       |  CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
       |       WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
       |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
       |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
       |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
       |       ELSE 'zh' END AS lang_pred
       |  FROM lg),
       |f AS (SELECT t.doc_id, qs.n_tokens::BIGINT AS n_tokens, lp.lang_pred,
       |  list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
       |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
       |  FROM t JOIN qs ON t.doc_id = qs.doc_id
       |         JOIN lp ON t.doc_id = lp.doc_id
       |  WHERE lp.lang_pred <> 'und'),
       |pairs AS (SELECT a.doc_id AS u, b.doc_id AS v
       |  FROM f a JOIN f b ON a.lang_pred = b.lang_pred AND a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
       |reach AS (
       |  SELECT doc_id AS ra, doc_id AS rb FROM f
       |  UNION
       |  SELECT r.ra, e.v FROM reach r JOIN edges e ON r.rb = e.u),
       |clu AS (SELECT ra AS id, min(rb) AS cluster FROM reach GROUP BY ra),
       |keep AS (SELECT f.* FROM f JOIN clu ON f.doc_id = clu.id
       |  WHERE clu.id = clu.cluster),
       |d2 AS (SELECT doc_id, lang_pred, n_tokens,
       |  ((doc_id % $m) * $a + 42) % $m * $b % $m AS h,
       |  CASE lang_pred WHEN 'en' THEN 5 WHEN 'zh' THEN 2 ELSE 1 END AS w10
       |  FROM keep),
       |r2 AS (SELECT doc_id, lang_pred, n_tokens, w10,
       |  row_number() OVER (PARTITION BY lang_pred ORDER BY h, doc_id) AS dom_rank
       |  FROM d2),
       |k2 AS (SELECT doc_id, lang_pred, n_tokens, dom_rank,
       |  (dom_rank * 10000) // w10 AS stride_key FROM r2),
       |p2 AS (SELECT doc_id, n_tokens,
       |  row_number() OVER (ORDER BY stride_key, lang_pred, dom_rank) AS pos
       |  FROM k2),
       |c2 AS (SELECT doc_id, n_tokens, pos,
       |  coalesce(sum(n_tokens) OVER (ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
       |  FROM p2),
       |e2 AS (SELECT *, (cum_before // 4000)::BIGINT AS shard FROM c2)
       |SELECT shard, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
       |  min(cum_before) AS start_tok, max(cum_before + n_tokens)::BIGINT AS end_tok,
       |  sum((doc_id * pos) % $m)::BIGINT AS checksum
       |FROM e2 GROUP BY shard""".stripMargin
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> (qHtmlExtract _),
    "q_html_boiler"  -> (qHtmlBoiler _),
    "q_url_canon"    -> (qUrlCanon _),
    "q_domain_cap"   -> (qDomainCap _),
    "q_line_dedup"   -> (qLineDedup _),
    "q_curation_e2e" -> (qCurationE2e _))

  val oracle: Map[String, String] = Map(
    "q_html_extract" -> qHtmlExtractSql,
    "q_html_boiler"  -> qHtmlBoilerSql,
    "q_url_canon"    -> qUrlCanonSql,
    "q_domain_cap"   -> qDomainCapSql,
    "q_line_dedup"   -> qLineDedupSql,
    "q_curation_e2e" -> qCurationE2eSql)
}
