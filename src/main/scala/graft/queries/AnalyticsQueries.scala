package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Driver-checked event-analytics and corpus-hygiene queries: funnel
  * analysis, cohort retention, time-series gap-fill with forward-fill,
  * histogram binning, and PII redaction. These extend the engine past the
  * reference's wrangling surface into the event/corpus analytics a
  * training-data pipeline runs at scale; every query here is
  * DuckDB-oracle-checked with an independently-written SQL formulation.
  *
  * Scale notes per query are on the method docs — the common theme is one
  * shuffle on the natural key (user_id / lang) and no driver round-trips.
  */
object AnalyticsQueries {

  // ------------------------------------------------------------- funnel

  /** Ordered conversion funnel view → click → purchase per user: stage k
    * counts users whose first stage-k event STRICTLY follows their stage
    * k-1 entry time. One shuffle: all three stage times are
    * partition-frame window minima over user_id (no per-stage join), then
    * a single global aggregate. The oracle is the independent three-CTE
    * min-after-join formulation. */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy("user_id")
    e.withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("ts") > col("t1"),
        col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
        col("ts"))).over(w))
      .agg(
        count_distinct(when(col("t1").isNotNull, col("user_id"))).as("n_view"),
        count_distinct(when(col("t2").isNotNull, col("user_id"))).as("n_click"),
        count_distinct(when(col("t3").isNotNull, col("user_id"))).as("n_purchase"))
  }

  val qFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events),
      |v AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
      |p AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_click,
      |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin

  // ------------------------------------------------------ session funnel

  /** Per-session conversion funnel: sessions form by 10-minute inactivity
    * gaps (the lag + cumulative-sum window idiom — one user_id shuffle,
    * no custom state needed in batch), then the view → click → purchase
    * ladder evaluates INSIDE each (user, session) partition with the same
    * strictly-after window minima as [[qFunnel]]. Output: one row per
    * session with its stage flags — product analytics' per-session
    * conversion table. */
  def qSessionFunnel(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 10L * 60 * 1000 * 1000
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val newSess = when(lag(col("ts"), 1).over(wOrd).isNull ||
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wOrd)) > gapUs, 1L)
      .otherwise(0L)
    val sessioned = e.withColumn("sess",
      sum(newSess).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy("user_id", "sess")
    val staged = sessioned
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(wSess))
      .withColumn("t2", min(when(col("event_type") === "click" && col("ts") > col("t1"),
        col("ts"))).over(wSess))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
        col("ts"))).over(wSess))
    staged.groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("s_start"),
        max(col("t1").isNotNull.cast("int")).as("viewed"),
        max(col("t2").isNotNull.cast("int")).as("clicked"),
        max(col("t3").isNotNull.cast("int")).as("purchased"))
  }

  val qSessionFunnelSql: String =
    """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type FROM events),
      |g AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000 THEN 1 ELSE 0 END AS ns
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |se AS (SELECT user_id, event_id, ts, event_type,
      |  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess FROM g),
      |st AS (SELECT *,
      |  min(CASE WHEN event_type = 'view' THEN ts END)
      |    OVER (PARTITION BY user_id, sess) AS t1 FROM se),
      |s2 AS (SELECT *,
      |  min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
      |    OVER (PARTITION BY user_id, sess) AS t2 FROM st),
      |s3 AS (SELECT *,
      |  min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
      |    OVER (PARTITION BY user_id, sess) AS t3 FROM s2)
      |SELECT user_id, sess, count(*) AS n_events, min(ts) AS s_start,
      |  max(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS viewed,
      |  max(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS clicked,
      |  max(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS purchased
      |FROM s3 GROUP BY user_id, sess""".stripMargin

  // ---------------------------------------------------------- retention

  /** Weekly cohort retention: users grouped by the week of their first
    * event; cell (cohort_week, week_offset) counts the cohort's users
    * active that week. Two shuffles on user_id (first-event min, then the
    * cohort join is a groupBy after an equi-join Catalyst can broadcast
    * when the user dimension is small relative to events — which it always
    * is). */
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
    val first = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    e.join(first, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(wk, cohort_week) div 7").cast(LongType).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("users"))
  }

  val qRetentionSql: String =
    """WITH e AS (SELECT user_id, date_trunc('week', ts::TIMESTAMP) AS wk FROM events),
      |f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1)
      |SELECT cohort_week, date_diff('day', cohort_week, wk) // 7 AS week_offset,
      |       count(DISTINCT user_id) AS users
      |FROM e JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------ gapfill

  /** Per-user daily time series with gaps filled: the spine is
    * `sequence(min_day, max_day)` exploded per user (the distributed
    * spine pattern — no driver-side calendar), missing days get
    * n_events=0, and the running value carries forward with
    * `last(_, ignoreNulls)` over an ordered window. Day 1 of every user is
    * a real observation, so the forward-fill never reads an empty frame. */
  def qGapfill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), Oracle.dsum(col("value")).as("v"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true)
          .over(Window.partitionBy("user_id").orderBy("day")).as("v_ff"))
  }

  val qGapfillSql: String =
    s"""WITH daily AS (SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS day,
       |  count(*) AS n, ${Oracle.sqlSum("value")} AS v FROM events GROUP BY 1, 2),
       |bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
       |spine AS (SELECT user_id,
       |  unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds)
       |SELECT s.user_id, s.day, coalesce(n, 0) AS n_events,
       |  last_value(v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
       |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day""".stripMargin

  // ---------------------------------------------------------- histogram

  /** Document-length histogram per language: fixed-width 100-char buckets
    * (capped at bucket 19), count and within-language share. Bucketing is
    * explicit integer arithmetic (DuckDB has no width_bucket); share is a
    * single exact-integer double divide, bit-identical across engines.
    * One shuffle on (lang, bucket); the share window re-shuffles only the
    * tiny histogram frame. */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .groupBy(col("lang"), least(expr("n_chars div 100"), lit(19L)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        col("n_docs") / sum(col("n_docs")).over(Window.partitionBy("lang")))
  }

  val qHistogramSql: String =
    """WITH h AS (SELECT lang, least(n_chars // 100, 19) AS bucket, count(*) AS n_docs
      |  FROM documents GROUP BY 1, 2)
      |SELECT lang, bucket, n_docs,
      |       n_docs / sum(n_docs) OVER (PARTITION BY lang) AS share
      |FROM h""".stripMargin

  // -------------------------------------------------------- PII redact

  // RE2- and Java-regex-compatible patterns (no lookaround, no backrefs).
  private val EmailPat = "[a-z0-9.]+@[a-z0-9.]+"
  private val PhonePat = "\\+1-555-[0-9]{4}"

  /** PII scrubbing — the corpus-hygiene pass every training pipeline runs
    * before release: regexp-redact emails and phone numbers, reporting
    * per-row match counts. The contact text is synthesized from `customer`
    * (the fixtures carry no real PII), which also makes every row exercise
    * both patterns. Pure map-side: no shuffle at any scale. */
  def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      col("c_name"), lit(" reach me at "),
      lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com or +1-555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
    Tables(s, dir, "customer").select(
      col("c_custkey"),
      regexp_count(raw, lit(EmailPat)).as("n_emails"),
      regexp_count(raw, lit(PhonePat)).as("n_phones"),
      regexp_replace(regexp_replace(raw, EmailPat, "[EMAIL]"), PhonePat, "[PHONE]")
        .as("redacted"))
  }

  val qPiiRedactSql: String =
    s"""WITH t AS (SELECT c_custkey,
       |  c_name || ' reach me at ' || lower(replace(c_name, '#', '.')) ||
       |  '@example.com or +1-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS raw
       |  FROM customer)
       |SELECT c_custkey,
       |  len(regexp_extract_all(raw, '$EmailPat')) AS n_emails,
       |  len(regexp_extract_all(raw, '\\+1-555-[0-9]{4}')) AS n_phones,
       |  regexp_replace(regexp_replace(raw, '$EmailPat', '[EMAIL]', 'g'),
       |    '\\+1-555-[0-9]{4}', '[PHONE]', 'g') AS redacted
       |FROM t""".stripMargin

  // --------------------------------------------------------------- EWMA

  /** Per-user exponentially weighted moving average (α = 0.5, seeded with
    * the first observation) over the event-time-ordered value stream. The
    * inherently sequential recurrence runs as a per-key fold over the
    * sort-collected sequence — one shuffle, state bounded by events/key,
    * and the fold's IEEE operation order is identical to DuckDB's
    * `list_reduce` (which seeds with the first element — matched here by
    * a NULL-initialized accumulator), so the result is bit-exact. */
  def qEwma(s: SparkSession, dir: String): DataFrame = {
    val seq = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("value")))).as("seq"))
    seq.select(col("user_id"), size(col("seq")).as("n_events"),
      aggregate(
        transform(col("seq"), x => x.getField("value")),
        lit(null).cast("double"),
        (acc, x) => when(acc.isNull, x).otherwise(lit(0.5) * x + lit(0.5) * acc))
        .as("ewma"))
  }

  val qEwmaSql: String =
    """WITH l AS (SELECT user_id,
      |  list_sort(list(struct_pack(ts := ts::TIMESTAMP, value := value))) AS seq
      |  FROM events GROUP BY 1)
      |SELECT user_id, len(seq) AS n_events,
      |  list_reduce(list_transform(seq, x -> x.value),
      |              (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma
      |FROM l""".stripMargin

  // ----------------------------------------------------- k-hop recursion

  /** Bounded BFS over the exact near-dup pair graph: min hop distance
    * ≤ 3 from a deterministic seed set. Visited-set BFS, not a
    * recursive CTE: each level joins only the FRONTIER (nodes first
    * reached at the previous depth) against the edge list and anti-
    * joins the accumulated visited set, so a node is expanded exactly
    * once at its minimum depth — the min(d)-over-all-rediscoveries
    * aggregate of the CTE form falls out by construction, settled
    * nodes are never re-joined against the edge list (the CTE form
    * re-expanded every rediscovery at deeper d), and no recursion
    * guardrail is involved at any scale. Per-level state is bounded by
    * |nodes|; depth is fixed at 3 → three hash joins + three anti-
    * joins, each checkpointed so the loop's lineage stays flat. */
  def qKhop(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val pairs = graft.ext.Dedup.prefixJaccardPairs(
      docs, "text", "doc_id", "lang", threshold = 0.5)
    // Materialized once: every BFS level joins the edge frame, and an
    // unmaterialized view would re-run the whole prefix-Jaccard pipeline
    // per level (same trap Dedup.clusters documents for its loop).
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .localCheckpoint()
    var frontier = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("id")).localCheckpoint()
    var visited = frontier.withColumn("hops", lit(0))
    for (d <- 1 to 3) {
      frontier = frontier.join(edges, frontier("id") === edges("u"))
        .select(col("v").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .localCheckpoint()
      visited = visited.unionAll(frontier.withColumn("hops", lit(d)))
    }
    visited.select(col("id"), col("hops"))
  }

  val qKhopSql: String =
    """WITH RECURSIVE t AS (SELECT doc_id, lang,
      |  string_split_regex(lower(trim(text)), '[ \t\n\f\r]+') AS w FROM documents),
      |sh AS (SELECT doc_id, lang,
      |  list_distinct(list_transform(range(0, greatest(len(w) - 3, 0) + 1),
      |    i -> array_to_string(w[i+1:i+3], ' '))) AS t FROM t),
      |pairs AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.t, b.t))::DOUBLE
      |      / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.5),
      |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
      |seeds AS (SELECT doc_id AS id FROM documents WHERE doc_id % 97 = 0),
      |walk(id, d) AS (
      |  SELECT id, 0 FROM seeds
      |  UNION ALL
      |  SELECT DISTINCT e.v, w.d + 1 FROM walk w JOIN edges e ON w.id = e.u WHERE w.d < 3)
      |SELECT id, min(d) AS hops FROM walk GROUP BY id""".stripMargin

  // ----------------------------------------------------------- outliers

  /** Per-user z-score outlier flags (|z| > 2): the data-quality pass that
    * spots anomalous values against each key's own distribution. Moments
    * come from exact integer power sums (the q_stats technique — value
    * carries exactly 2 decimals, so round(v*100) is exact), the per-user
    * stats frame broadcasts back onto the events, and every derived op is
    * the same IEEE double arithmetic on both engines — so even the
    * boundary events flag identically. */
  def qOutliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), round(col("value") * 100).as("v"))
    val stats = e.groupBy("user_id")
      .agg(count(lit(1)).cast(DoubleType).as("n"),
        sum(col("v").cast(DecimalType(38, 0))).cast(DoubleType).as("sx"),
        sum((col("v") * col("v")).cast(DecimalType(38, 0))).cast(DoubleType).as("sxx"))
    val sd = sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
    e.join(broadcast(stats), "user_id")
      .withColumn("z", (col("v") - col("sx") / col("n")) / sd)
      .filter(abs(col("z")) > 2)
      .select(col("user_id"), col("event_id"), (col("v") / 100).as("value"), col("z"))
  }

  val qOutliersSql: String =
    """WITH e AS (SELECT user_id, event_id, round(value * 100) AS v FROM events),
      |s AS (SELECT user_id, count(*)::DOUBLE AS n,
      |  CAST(sum(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS sx,
      |  CAST(sum(CAST(v * v AS DECIMAL(38,0))) AS DOUBLE) AS sxx
      |  FROM e GROUP BY 1)
      |SELECT user_id, event_id, v / 100 AS value,
      |  (v - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)) AS z
      |FROM e JOIN s USING (user_id)
      |WHERE abs((v - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1))) > 2""".stripMargin

  // ------------------------------------------------- sequence features

  /** Behavioral sequence features — the per-event trailing context a
    * sequence model trains on: the last-3 event types (ordered, including
    * current) and microseconds since the previous event, per user. One
    * user_id shuffle; both the frame collect and the lag share the same
    * sort. Output arrays serialize via the gate's JSON protocol. */
  def qSeqFeatures(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .select(col("user_id"), col("event_id"),
        to_json(collect_list(col("event_type"))
          .over(w.rowsBetween(-2, Window.currentRow))).as("last3"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"))
  }

  val qSeqFeaturesSql: String =
    """SELECT user_id, event_id,
      |  to_json(list(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts::TIMESTAMP, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS last3,
      |  epoch_us(ts::TIMESTAMP)
      |    - epoch_us(lag(ts::TIMESTAMP, 1) OVER (PARTITION BY user_id
      |        ORDER BY ts::TIMESTAMP, event_id)) AS gap_us
      |FROM events""".stripMargin

  // ------------------------------------------------------- fuzzy lookup

  /** Fuzzy dimension lookup (entity resolution): each supplier resolves to
    * its minimum-edit-distance customer name within the same nation. The
    * clean dimension broadcasts — the dirty side never shuffles — and the
    * argmin is a lexicographic struct `min` (distance, then name, so ties
    * break deterministically), giving map-side partial aggregation instead
    * of a window sort. At 100 TB this is the "reconcile dirty keys against
    * a reference dim" shape: broadcast + per-key min, no quadratic pass. */
  def qFuzzyLookup(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables(s, dir, "supplier")
    val cust = Tables(s, dir, "customer")
      .select(col("c_name"), col("c_nationkey"))
    sup.join(broadcast(cust), col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(min(struct(
        levenshtein(col("s_name"), col("c_name")).cast(LongType).as("lev"),
        col("c_name").as("match_name"))).as("m"))
      .select(col("s_suppkey"), col("s_name"),
        col("m.lev").as("lev"), col("m.match_name").as("match_name"))
  }

  val qFuzzyLookupSql: String =
    """WITH j AS (SELECT s_suppkey, s_name, levenshtein(s_name, c_name) AS lev, c_name
      |  FROM supplier JOIN customer ON s_nationkey = c_nationkey),
      |r AS (SELECT *, row_number() OVER (PARTITION BY s_suppkey ORDER BY lev, c_name) AS rn
      |  FROM j)
      |SELECT s_suppkey, s_name, lev, c_name AS match_name FROM r WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel"     -> (qFunnel _),
    "q_retention"  -> (qRetention _),
    "q_gapfill"    -> (qGapfill _),
    "q_histogram"  -> (qHistogram _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_ewma"       -> (qEwma _),
    "q_fuzzy_lookup" -> (qFuzzyLookup _),
    "q_seq_features" -> (qSeqFeatures _),
    "q_session_funnel" -> (qSessionFunnel _),
    "q_outliers"   -> (qOutliers _),
    "q_khop"       -> (qKhop _))

  val oracle: Map[String, String] = Map(
    "q_funnel"     -> qFunnelSql,
    "q_retention"  -> qRetentionSql,
    "q_gapfill"    -> qGapfillSql,
    "q_histogram"  -> qHistogramSql,
    "q_pii_redact" -> qPiiRedactSql,
    "q_ewma"       -> qEwmaSql,
    "q_fuzzy_lookup" -> qFuzzyLookupSql,
    "q_seq_features" -> qSeqFeaturesSql,
    "q_session_funnel" -> qSessionFunnelSql,
    "q_outliers"   -> qOutliersSql,
    "q_khop"       -> qKhopSql)
}
