package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import Oracle._

/** The classic engine-operator catalog the reference lacks entirely
  * (SURVEY.md §2.5): joins of every flavor, aggregation, windows, sorts/
  * top-k, set ops, grouping sets, pivot/unpivot, the scalar function
  * library, and the SQL front-end. All plain Catalyst plans — broadcast
  * hints on dimension joins, decimal-exact double sums for oracle parity.
  *
  * Scale notes (100 TB design): dimension sides (`nation`, `customer`
  * slices) are broadcast so the big fact scan never shuffles for them;
  * aggregations are partial+final (map-side combine) by construction;
  * window queries partition by high-cardinality keys. */
object RelationalQueries {

  /** Star join: revenue by nation, dims broadcast, filter pushed to scan. */
  def qJoinStar(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val qJoinStarSql: String =
    s"""SELECT n_name, ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |count(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name""".stripMargin

  /** Semi + anti joins (EXISTS / NOT EXISTS), tagged and unioned. */
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders").select(col("o_custkey"))
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey").as("custkey"), lit("has_orders").as("tag"))
    val noOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey").as("custkey"), lit("no_orders").as("tag"))
    withOrders.unionAll(noOrders)
  }

  val qSemiAntiSql: String =
    """SELECT c_custkey AS custkey, 'has_orders' AS tag FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey AS custkey, 'no_orders' AS tag FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Left-outer join + aggregate: per-customer order count including zeros. */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey").as("custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
  }

  val qOuterJoinSql: String =
    s"""SELECT c_custkey AS custkey, count(o_orderkey) AS n_orders,
       |${sqlSum("COALESCE(o_totalprice, 0.0)")} AS total_spent
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey""".stripMargin

  /** FULL OUTER join of two disjoint per-customer aggregates — customers
    * holding only fulfilled or only open orders survive on one side with
    * NULLs on the other. Both inputs aggregate BEFORE the join, so the
    * full-outer exchange carries one row per (customer, side), not raw
    * orders. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    def side(status: String, n: String) = o.filter(col("o_orderstatus") === status)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as(n))
    side("F", "n_fulfilled").join(side("O", "n_open"), Seq("o_custkey"), "full")
      .select(col("o_custkey").as("custkey"),
        coalesce(col("n_fulfilled"), lit(0L)).as("n_fulfilled"),
        coalesce(col("n_open"), lit(0L)).as("n_open"))
  }

  val qFullOuterSql: String =
    """WITH f AS (SELECT o_custkey, count(*) AS n_fulfilled FROM orders
      |  WHERE o_orderstatus = 'F' GROUP BY 1),
      |o AS (SELECT o_custkey, count(*) AS n_open FROM orders
      |  WHERE o_orderstatus = 'O' GROUP BY 1)
      |SELECT COALESCE(f.o_custkey, o.o_custkey) AS custkey,
      |  COALESCE(n_fulfilled, 0) AS n_fulfilled,
      |  COALESCE(n_open, 0) AS n_open
      |FROM f FULL OUTER JOIN o ON f.o_custkey = o.o_custkey""".stripMargin

  /** Window functions: row_number / running sum / lag over a total order. */
  def qWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "lineitem").select(
      col("l_suppkey").as("suppkey"),
      col("l_orderkey").as("okey"),
      col("l_linenumber").as("lnum"),
      row_number().over(w).as("rn"),
      dense_rank().over(Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_returnflag"))).as("drk"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("prk"),
      sum(col("l_quantity").cast(DecimalType(27, 7))).over(wr).cast(DoubleType)
        .as("running_qty"),
      lag(col("l_quantity"), 1).over(w).as("prev_qty"),
      lead(col("l_quantity"), 1).over(w).as("next_qty"))
  }

  val qWindowSql: String =
    """SELECT l_suppkey AS suppkey, l_orderkey AS okey, l_linenumber AS lnum,
      |row_number() OVER w AS rn,
      |dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_returnflag) AS drk,
      |ntile(4) OVER w AS quartile,
      |percent_rank() OVER w AS prk,
      |CAST(sum(CAST(l_quantity AS DECIMAL(27,7))) OVER
      |  (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
      |lag(l_quantity, 1) OVER w AS prev_qty,
      |lead(l_quantity, 1) OVER w AS next_qty
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)""".stripMargin

  /** Top-k with deterministic tiebreak: highest-revenue customers. */
  def qTopK(s: SparkSession, dir: String): DataFrame = {
    // Revenue pre-aggregates per order below the join (the groupBy
    // partitions on the join key, so it rides the join's exchange), the
    // per-customer regroup runs over one row per order, and the final
    // top-10 is TakeOrdered — no global sort. Decimal sums reassociate
    // exactly.
    val lrev = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(27, 7))).as("orev"))
    val o = Tables(s, dir, "orders")
    lrev.join(o, col("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("orev")).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("custkey").asc)
      .limit(10)
  }

  val qTopKSql: String =
    s"""SELECT o_custkey AS custkey,
       |${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_custkey
       |ORDER BY revenue DESC, custkey ASC LIMIT 10""".stripMargin

  /** Range-frame window (numeric RANGE BETWEEN) + value window functions
    * (first/last/nth value, cume_dist). Range frames include ALL peers of
    * the current order value, so results are tie-deterministic. */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("v_lineitem_wr")
    s.sql(
      """SELECT l_orderkey AS okey, l_linenumber AS lnum, l_returnflag AS flag,
        |l_quantity AS qty,
        |CAST(sum(CAST(l_quantity AS DECIMAL(27,7))) OVER
        |  (PARTITION BY l_returnflag ORDER BY l_quantity
        |   RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_near,
        |first_value(l_orderkey) OVER w AS first_ok,
        |last_value(l_orderkey) OVER w AS last_ok,
        |nth_value(l_orderkey, 3) OVER w AS third_ok,
        |cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
        |FROM v_lineitem_wr
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_quantity, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  val qWindowRangeSql: String =
    """SELECT l_orderkey AS okey, l_linenumber AS lnum, l_returnflag AS flag,
      |l_quantity AS qty,
      |CAST(sum(CAST(l_quantity AS DECIMAL(27,7))) OVER
      |  (PARTITION BY l_returnflag ORDER BY l_quantity
      |   RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_near,
      |first_value(l_orderkey) OVER w AS first_ok,
      |last_value(l_orderkey) OVER w AS last_ok,
      |nth_value(l_orderkey, 3) OVER w AS third_ok,
      |cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_returnflag
      |  ORDER BY l_quantity, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Dataset profiling: per-column counts/distinct/min/max in ONE
    * aggregation pass, melted to a row per column. */
  def qProfile(s: SparkSession, dir: String): DataFrame =
    graft.exec.Profiling.profile(Tables(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  val qProfileSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS total, count($c) AS nonnull,
         |count(DISTINCT $c) AS n_distinct,
         |CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v
         |FROM orders""".stripMargin
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .map(one).mkString("\nUNION ALL\n")
  }

  /** Data-quality constraint checks in one report: key uniqueness,
    * referential integrity (orphan FKs via anti-join), null rate, and a
    * domain/range rule — each as a named violation count. */
  def qConstraints(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val dupKeys = o.groupBy(col("o_orderkey")).count().filter(col("count") > 1)
      .agg(count(lit(1)).as("violations"))
      .select(lit("orderkey_not_unique").as("rule"), col("violations"))
    val orphans = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orphan_custkey").as("rule"), col("violations"))
    val nulls = o.agg(count(when(col("o_orderdate").isNull, 1)).as("violations"))
      .select(lit("null_orderdate").as("rule"), col("violations"))
    val range = o.agg(count(when(col("o_totalprice") <= 0.0, 1)).as("violations"))
      .select(lit("nonpositive_totalprice").as("rule"), col("violations"))
    dupKeys.unionAll(orphans).unionAll(nulls).unionAll(range)
  }

  val qConstraintsSql: String =
    """SELECT 'orderkey_not_unique' AS rule, count(*) AS violations
      |FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'orphan_custkey', count(*) FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |UNION ALL
      |SELECT 'null_orderdate', count(*) FROM orders WHERE o_orderdate IS NULL
      |UNION ALL
      |SELECT 'nonpositive_totalprice', count(*) FROM orders WHERE o_totalprice <= 0.0""".stripMargin

  /** Correlated LATERAL subquery join: each customer's single
    * highest-value order (per-key top-1 via correlated ORDER BY + LIMIT —
    * the decorrelation-machinery exercise; Catalyst rewrites it to a
    * ranked window join). */
  def qLateral(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("v_customer_lat")
    Tables(s, dir, "orders").createOrReplaceTempView("v_orders_lat")
    s.sql(
      """SELECT c_custkey AS custkey, o.okey, o.top_price
        |FROM v_customer_lat, LATERAL (
        |  SELECT o_orderkey AS okey, o_totalprice AS top_price
        |  FROM v_orders_lat WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o""".stripMargin)
  }

  val qLateralSql: String =
    """SELECT c_custkey AS custkey, o.okey, o.top_price
      |FROM customer, LATERAL (
      |  SELECT o_orderkey AS okey, o_totalprice AS top_price
      |  FROM orders WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o""".stripMargin

  /** Multiset set-ops (EXCEPT ALL / INTERSECT ALL) over a key with real
    * duplicate multiplicity. */
  def qSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
    val r = li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
    a.exceptAll(r).select(col("l_suppkey").as("suppkey"), lit("except_all").as("op"))
      .unionAll(a.intersectAll(r)
        .select(col("l_suppkey").as("suppkey"), lit("intersect_all").as("op")))
  }

  val qSetOpsAllSql: String =
    """WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
      |r AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
      |SELECT l_suppkey AS suppkey, 'except_all' AS op
      |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM r)
      |UNION ALL
      |SELECT l_suppkey AS suppkey, 'intersect_all' AS op
      |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM r)""".stripMargin

  /** Set operations: union distinct / intersect / except, tagged. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val rich = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    auto.union(rich).distinct().select(col("c_custkey").as("custkey"), lit("union").as("op"))
      .unionAll(auto.intersect(rich).select(col("c_custkey").as("custkey"), lit("intersect").as("op")))
      .unionAll(auto.except(rich).select(col("c_custkey").as("custkey"), lit("except").as("op")))
  }

  val qSetOpsSql: String =
    """WITH auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
      |rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |SELECT c_custkey AS custkey, 'union' AS op FROM (SELECT * FROM auto UNION SELECT * FROM rich)
      |UNION ALL
      |SELECT c_custkey AS custkey, 'intersect' AS op FROM (SELECT * FROM auto INTERSECT SELECT * FROM rich)
      |UNION ALL
      |SELECT c_custkey AS custkey, 'except' AS op FROM (SELECT * FROM auto EXCEPT SELECT * FROM rich)""".stripMargin

  /** DISTINCT + exact distinct-count aggregation. */
  def qDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"))
  }

  val qDistinctSql: String =
    """SELECT l_returnflag AS returnflag,
      |count(DISTINCT l_suppkey) AS n_supp,
      |count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
      |FROM lineitem GROUP BY 1""".stripMargin

  /** ROLLUP — subtotal + grand-total rows (NULL group keys). */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .rollup(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
  }

  val qRollupSql: String =
    s"""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       |count(*) AS n, ${sqlSum("l_quantity")} AS qty
       |FROM lineitem GROUP BY ROLLUP (1, 2)""".stripMargin

  /** CUBE over order status × priority. */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .cube(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
  }

  val qCubeSql: String =
    s"""SELECT o_orderstatus AS status, o_orderpriority AS priority,
       |count(*) AS n, ${sqlSum("o_totalprice")} AS total
       |FROM orders GROUP BY CUBE (1, 2)""".stripMargin

  /** Scalar function library: strings, dates, math — all codegen'd built-ins. */
  def qScalarLib(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").select(
      col("o_orderkey").as("okey"),
      upper(col("o_orderpriority")).as("up"),
      lower(col("o_orderstatus")).as("lo"),
      substring(col("o_orderpriority"), 1, 1).as("pfx"),
      length(col("o_orderpriority")).as("len"),
      concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("cat"),
      regexp_replace(col("o_orderpriority"), "[0-9]-", "").as("cleaned"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dom"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      abs(col("o_totalprice") - lit(100000.0)).as("dist"),
      floor(col("o_totalprice")).as("fl"),
      ceil(col("o_totalprice")).as("ce"),
      sqrt(col("o_totalprice")).as("rt"),
      (col("o_orderkey") % 7).as("m7"),
      md5(col("o_orderpriority").cast(BinaryType)).as("h_md5"),
      sha2(col("o_orderstatus").cast(BinaryType), 256).as("h_sha"),
      base64(col("o_orderstatus").cast(BinaryType)).as("b64"),
      reverse(col("o_orderpriority")).as("rev"),
      lpad(col("o_orderkey").cast(StringType), 12, "0").as("padded"),
      split_part(col("o_orderpriority"), lit("-"), lit(2)).as("prio_word"))
  }

  val qScalarLibSql: String =
    """SELECT o_orderkey AS okey,
      |upper(o_orderpriority) AS up, lower(o_orderstatus) AS lo,
      |substring(o_orderpriority, 1, 1) AS pfx, length(o_orderpriority) AS len,
      |concat_ws('|', o_orderstatus, o_orderpriority) AS cat,
      |regexp_replace(o_orderpriority, '[0-9]-', '') AS cleaned,
      |year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
      |date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
      |abs(o_totalprice - 100000.0) AS dist,
      |CAST(floor(o_totalprice) AS BIGINT) AS fl, CAST(ceil(o_totalprice) AS BIGINT) AS ce,
      |sqrt(o_totalprice) AS rt,
      |o_orderkey % 7 AS m7,
      |md5(o_orderpriority) AS h_md5,
      |sha256(o_orderstatus) AS h_sha,
      |to_base64(o_orderstatus::BLOB) AS b64,
      |reverse(o_orderpriority) AS rev,
      |lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded,
      |split_part(o_orderpriority, '-', 2) AS prio_word
      |FROM orders""".stripMargin

  /** PIVOT: order counts by status per priority. */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("priority"), coalesce(col("F"), lit(0L)).as("f"),
        coalesce(col("O"), lit(0L)).as("o"), coalesce(col("P"), lit(0L)).as("p"))
  }

  val qPivotSql: String =
    """SELECT o_orderpriority AS priority,
      |count(*) FILTER (o_orderstatus = 'F') AS f,
      |count(*) FILTER (o_orderstatus = 'O') AS o,
      |count(*) FILTER (o_orderstatus = 'P') AS p
      |FROM orders GROUP BY 1""".stripMargin

  /** UNPIVOT/melt: lineitem measures to long form. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .select(col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
        col("measure"), col("val"))
  }

  val qUnpivotSql: String =
    """SELECT l_orderkey AS okey, l_linenumber AS lnum, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem""".stripMargin

  /** The SQL front-end (free via spark.sql): TPC-H Q3 shape over temp views. */
  def qSql(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("v_customer")
    Tables(s, dir, "orders").createOrReplaceTempView("v_orders")
    Tables(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    s.sql(
      s"""SELECT l_orderkey AS okey,
         |CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,7))) AS DOUBLE) AS revenue,
         |o_orderdate AS odate
         |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
         |JOIN v_lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-03-15'
         |  AND l_shipdate > TIMESTAMP '1997-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, okey ASC LIMIT 20""".stripMargin)
  }

  val qSqlSql: String =
    s"""SELECT l_orderkey AS okey,
       |${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |o_orderdate AS odate
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-03-15'
       |  AND l_shipdate > TIMESTAMP '1997-03-15'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, okey ASC LIMIT 20""".stripMargin

  /** As-of (point-in-time) join: each purchase matched to the user's most
    * recent prior view — the union+window single-shuffle algorithm
    * (graft.exec.Joins.asOf); oracle is DuckDB's native ASOF LEFT JOIN. */
  def qAsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("amount"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    graft.exec.Joins.asOf(p, v, Seq("user_id"), "ts", "ts")
  }

  val qAsOfJoinSql: String =
    """WITH p AS (SELECT user_id, ts::TIMESTAMP AS ts, value AS amount
      |           FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events
      |      WHERE event_type = 'view')
      |SELECT p.user_id, p.ts, p.amount, v.ts AS r_ts, v.value AS r_value
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin

  /** Forward as-of: each view matched to the user's NEXT purchase at or
    * after it (time-to-conversion shape). Same single-shuffle union+window
    * algorithm with the forward frame; the oracle is a correlated LATERAL
    * top-1, deliberately a different formulation. Ambiguous ties (two
    * right rows at one timestamp) don't exist in the fixture (µs
    * timestamps are unique per user). */
  def qAsOfForward(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("amount"))
    graft.exec.Joins.asOf(v, p, Seq("user_id"), "ts", "ts",
      direction = "forward")
  }

  val qAsOfForwardSql: String =
    """WITH v AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id
      |           FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, ts::TIMESTAMP AS ts, value AS amount FROM events
      |      WHERE event_type = 'purchase')
      |SELECT v.user_id, v.ts, v.event_id, m.r_ts, m.r_amount
      |FROM v LEFT JOIN LATERAL (
      |  SELECT p.ts AS r_ts, p.amount AS r_amount FROM p
      |  WHERE p.user_id = v.user_id AND p.ts >= v.ts
      |  ORDER BY p.ts LIMIT 1) m ON TRUE""".stripMargin

  /** Range (interval) join via bucketization: customers against overlapping
    * account-balance bands derived from nation. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val bands = Tables(s, dir, "nation").select(
      col("n_nationkey").as("band_id"),
      (col("n_nationkey") * 400.0 - 1000.0).as("lo"),
      (col("n_nationkey") * 400.0 - 200.0).as("hi"))
    graft.exec.Joins.range(c, "c_acctbal", bands, "lo", "hi", bucketWidth = 800.0)
      .select(col("c_custkey").as("custkey"), col("c_acctbal").as("acctbal"),
        col("band_id"))
  }

  val qRangeJoinSql: String =
    """SELECT c_custkey AS custkey, c_acctbal AS acctbal, n_nationkey AS band_id
      |FROM customer JOIN nation
      |ON c_acctbal >= n_nationkey * 400.0 - 1000.0
      |AND c_acctbal < n_nationkey * 400.0 - 200.0""".stripMargin

  /** Exact interpolated percentiles (ordered-set aggregate) — identical
    * linear-interpolation semantics in both engines. */
  def qPercentile(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l_returnflag AS returnflag,
        |percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
        |percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95_price
        |FROM v_lineitem GROUP BY 1""".stripMargin)
  }

  val qPercentileSql: String =
    """SELECT l_returnflag AS returnflag,
      |percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
      |percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95_price
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Discrete percentiles (the actual element at or above the quantile
    * position, no interpolation) — spelled out as ceil(p·n) over a
    * per-group rank instead of the built-in `percentile_disc`, whose
    * boundary convention differs between engines. Ties on the value break
    * by the full sort (value, orderkey, linenumber), so the "which equal
    * element" question has one answer everywhere. */
  def qPercentileDisc(s: SparkSession, dir: String): DataFrame = {
    // Distributed rank-position lookup (value histogram + two-level
    // cumulative counts, graft.exec.RankBoundaries) instead of a
    // PARTITION BY l_returnflag whole-group sort window: 3 distinct
    // flags = 3 monolithic sort tasks at 100 TB. The rank position names
    // a unique VALUE regardless of the oracle's tie-break columns, so
    // the window-formulated oracle holds unchanged. The position
    // arithmetic (double ceil) matches the oracle expression exactly —
    // IEEE double ops are bit-identical across engines.
    val li = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
    graft.exec.RankBoundaries.valuesAt(li, "l_returnflag", "l_quantity", Seq(
        "p50_disc" -> (_ => expr("cast(ceil(0.5 * n) as bigint)")),
        "p95_disc" -> (_ => expr("cast(ceil(0.95 * n) as bigint)"))))
      .withColumnRenamed("l_returnflag", "returnflag")
  }

  val qPercentileDiscSql: String =
    """WITH r AS (SELECT l_returnflag, l_quantity,
      |  row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
      |  count(*) OVER (PARTITION BY l_returnflag) AS n
      |FROM lineitem)
      |SELECT l_returnflag AS returnflag,
      |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN l_quantity END) AS p50_disc,
      |  max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN l_quantity END) AS p95_disc
      |FROM r GROUP BY 1""".stripMargin

  /** HAVING + uncorrelated scalar subquery: nations whose revenue exceeds
    * the all-nation average. */
  def qHaving(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    Tables(s, dir, "orders").createOrReplaceTempView("v_orders")
    Tables(s, dir, "customer").createOrReplaceTempView("v_customer")
    Tables(s, dir, "nation").createOrReplaceTempView("v_nation")
    // The CTE is referenced twice (main query + scalar subquery) and Spark
    // inlines CTEs, so without materialization the 4-way join would execute
    // twice. The grouped result is |nations| rows — checkpoint it once; the
    // same pattern holds at 100 TB, where re-running the fact join to score
    // its own aggregate would double the query cost.
    //
    // The inner `lrev` pre-aggregates lineitem revenue per order BEFORE the
    // orders join — a partial-aggregation pushdown Catalyst does not do on
    // its own. The groupBy partitions on l_orderkey, which IS the join key,
    // so it shares the exchange the join needs anyway and the join sees one
    // row per order instead of ~4 lineitems. Decimal addition is exact and
    // associative, so regrouping by nation afterwards changes nothing.
    val rev = s.sql(
      """WITH lrev AS (
        |  SELECT l_orderkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,7))) AS orev
        |  FROM v_lineitem GROUP BY l_orderkey)
        |SELECT n_name, CAST(sum(orev) AS DOUBLE) AS revenue
        |FROM lrev JOIN v_orders ON l_orderkey = o_orderkey
        |JOIN v_customer ON o_custkey = c_custkey
        |JOIN v_nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin).localCheckpoint()
    rev.createOrReplaceTempView("v_rev")
    s.sql(
      """SELECT n_name, revenue FROM v_rev
        |GROUP BY n_name, revenue
        |HAVING revenue > (SELECT CAST(sum(CAST(r2.revenue AS DECIMAL(27,7))) AS DOUBLE) / count(*) FROM v_rev r2)""".stripMargin)
  }

  val qHavingSql: String =
    """WITH rev AS (
      |  SELECT n_name,
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,7))) AS DOUBLE) AS revenue
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name, revenue FROM rev
      |GROUP BY n_name, revenue
      |HAVING revenue > (SELECT CAST(sum(CAST(r2.revenue AS DECIMAL(27,7))) AS DOUBLE) / count(*) FROM rev r2)""".stripMargin

  /** Explicit GROUPING SETS with grouping() markers. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("v_orders_gs")
    s.sql(
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |count(*) AS n,
        |grouping(o_orderstatus) AS g_status, grouping(o_orderpriority) AS g_prio
        |FROM v_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority), ())""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |count(*) AS n,
      |grouping(o_orderstatus) AS g_status, grouping(o_orderpriority) AS g_prio
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |                        (o_orderstatus, o_orderpriority), ())""".stripMargin

  /** Array function library over the embeddings fixture. */
  def qArrayLib(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val arr = col("embedding")
    // Array outputs serialize to quantized JSON for the driver's comparator
    // (Oracle.q6 doc); scalar floats/bools/ints stay raw.
    val J = (c: org.apache.spark.sql.Column) => to_json(transform(c, x => Oracle.q6(x)))
    e.select(
      col("vec_id"),
      J(sort_array(arr)).as("sorted"),
      array_max(arr).as("mx"),
      array_min(arr).as("mn"),
      J(slice(arr, 5, 3)).as("sl"),
      J(sort_array(array_distinct(arr))).as("dst"), // sorted: DuckDB's
      // list_distinct does not preserve order
      size(arr).as("n"),
      exists(arr, x => x > 0.2f).as("has_big"),
      forall(arr, x => x > -1.0f).as("all_gt"),
      array_contains(arr, 0.0f).as("has_zero"),
      J(reverse(arr)).as("rev"),
      to_json(transform(arrays_zip(slice(arr, 1, 2), slice(arr, 3, 2)),
        z => struct(Oracle.q6(z.getField("0")).as("0"),
                    Oracle.q6(z.getField("1")).as("1")))).as("zipped"))
  }

  val qArrayLibSql: String = {
    val Q = (e: String) => Oracle.sqlQ6(e)
    s"""SELECT vec_id,
       |to_json(list_transform(list_sort(embedding), x -> ${Q("x")})) AS sorted,
       |list_max(embedding) AS mx,
       |list_min(embedding) AS mn,
       |to_json(list_transform(embedding[5:7], x -> ${Q("x")})) AS sl,
       |to_json(list_transform(list_sort(list_distinct(embedding)), x -> ${Q("x")})) AS dst,
       |len(embedding) AS n,
       |len(list_filter(embedding, x -> x > 0.2)) > 0 AS has_big,
       |len(list_filter(embedding, x -> NOT (x > -1.0))) = 0 AS all_gt,
       |list_contains(embedding, 0.0) AS has_zero,
       |to_json(list_transform(list_reverse(embedding), x -> ${Q("x")})) AS rev,
       |to_json(list_transform(list_zip(embedding[1:2], embedding[3:4]),
       |  p -> {'0': ${Q("p[1]")}, '1': ${Q("p[2]")}})) AS zipped
       |FROM embeddings""".stripMargin
  }

  /** Datetime function library over orders/events. */
  def qDatetime(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").select(
      col("o_orderkey").as("okey"),
      quarter(col("o_orderdate")).as("q"),
      last_day(col("o_orderdate")).as("eom"),
      date_add(col("o_orderdate").cast(DateType), 30).as("plus30"),
      hour(col("o_orderdate")).as("hr"),
      dayofyear(col("o_orderdate")).as("doy"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"),
      datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType))
        .as("days_since"))
  }

  val qDatetimeSql: String =
    """SELECT o_orderkey AS okey,
      |quarter(o_orderdate) AS q,
      |last_day(o_orderdate::DATE) AS eom,
      |o_orderdate::DATE + 30 AS plus30,
      |hour(o_orderdate) AS hr,
      |dayofyear(o_orderdate) AS doy,
      |epoch(o_orderdate)::BIGINT AS epoch_s,
      |date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since
      |FROM orders""".stripMargin

  /** Hot-key aggregation through the two-phase salted path
    * (graft.exec.Skew): l_returnflag has only 3 values — the exact shape
    * where one reducer would own a third of the table. The oracle is the
    * plain GROUP BY: salting must be invisible in the result. */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.exec.Skew.saltedAgg(
      Tables(s, dir, "lineitem"), Seq("l_returnflag"), salts = 16,
      partial = Seq(
        sum(col("l_quantity").cast(DecimalType(27, 7))).as("p_qty"),
        count(lit(1)).as("p_n")),
      combine = Seq(
        sum(col("p_qty")).cast(DoubleType).as("qty"),
        sum(col("p_n")).as("n")))

  val qSaltedAggSql: String =
    s"""SELECT l_returnflag, ${sqlSum("l_quantity")} AS qty, count(*) AS n
       |FROM lineitem GROUP BY 1""".stripMargin

  /** SALTED SKEW JOIN under the oracle gate (the q_salted_agg twin —
    * previously JoinsSpec-only): join the fact table to a 3-row
    * per-returnflag dimension on the flag alone — the extreme-skew
    * shape where EVERY key is hot and a plain shuffle join puts a third
    * of the fact on one reducer. [[graft.exec.Skew.saltedJoin]] spreads
    * each hot key over 8 salted reducers (dim replicated 8-way); the
    * oracle is the PLAIN join, so a hash-pass proves salting changes
    * nothing about the result — no duplicated and no lost rows — while
    * the skew benefit itself stays asserted in JoinsSpec. Dim
    * attributes are exact (count / max), so no float-summation rule is
    * needed. */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val dim = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("flag_n"),
      max(col("l_quantity")).as("flag_max_qty"))
    graft.exec.Skew.saltedJoin(
        li.select(col("l_returnflag"), col("l_linestatus")), dim,
        Seq("l_returnflag"), salts = 8)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        max(col("flag_n")).as("flag_n"),
        max(col("flag_max_qty")).as("flag_max_qty"))
  }

  val qSaltedJoinSql: String =
    """WITH dim AS (SELECT l_returnflag, count(*)::BIGINT AS flag_n,
      |    max(l_quantity) AS flag_max_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT f.l_returnflag, f.l_linestatus, count(*)::BIGINT AS n,
      |  max(d.flag_n)::BIGINT AS flag_n,
      |  max(d.flag_max_qty) AS flag_max_qty
      |FROM lineitem f JOIN dim d ON f.l_returnflag = d.l_returnflag
      |GROUP BY 1, 2""".stripMargin

  /** Statistical aggregates — stddev, covariance, correlation — computed
    * from exact decimal power sums rather than the built-in streaming
    * aggregates: Spark (Welford-style updates) and DuckDB accumulate in
    * different orders, so their floating-point results differ run-to-run
    * and engine-to-engine, while power sums through DECIMAL(38,14) are
    * order-independent and make the derived moments bit-identical. The
    * shuffle cost is the same (one grouped pass, map-side partials). */
  def qStats(s: SparkSession, dir: String): DataFrame = {
    // Power sums over EXACT INTEGERS: quantity is integer-valued and
    // extendedprice carries exactly 2 decimals, so round(y*100) is exact
    // (the *100 product of a decimal-derived double rounds to the true
    // integer), every per-row product stays below 2^53, and the
    // DECIMAL(38,0) sums are exact on both engines — fractional decimal
    // casts are NOT cross-engine-stable (Spark converts doubles via
    // shortest string, DuckDB via exact binary expansion), integer casts
    // are. The derived moments then use identical IEEE double ops on both
    // sides; corr is scale-invariant and covar unscales by 100.
    val x = col("l_quantity"); val y = round(col("l_extendedprice") * 100)
    def d(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 0))).cast(DoubleType)
    val base = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(count(lit(1)).cast(DoubleType).as("n"), d(x).as("sx"), d(y).as("sy"),
        d(x * x).as("sxx"), d(y * y).as("syy"), d(x * y).as("sxy"))
    val varQ = (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)
    val varP = (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)
    val covarS = (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)
    base.select(col("returnflag"), col("n").cast("long").as("n"),
      varQ.as("var_qty"), sqrt(varQ).as("sd_qty"),
      (covarS / 100).as("covar"),
      (covarS / (sqrt(varQ) * sqrt(varP))).as("corr"))
  }

  val qStatsSql: String = {
    def d(e: String) = s"CAST(sum(CAST(($e) AS DECIMAL(38,0))) AS DOUBLE)"
    val y = "round(l_extendedprice * 100)"
    s"""WITH m AS (SELECT l_returnflag AS returnflag, count(*)::DOUBLE AS n,
       |  ${d("l_quantity")} AS sx, ${d(y)} AS sy,
       |  ${d("l_quantity * l_quantity")} AS sxx,
       |  ${d(s"$y * $y")} AS syy,
       |  ${d(s"l_quantity * $y")} AS sxy
       |  FROM lineitem GROUP BY 1)
       |SELECT returnflag, CAST(n AS BIGINT) AS n,
       |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
       |  sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_qty,
       |  ((sxy - sx * sy / n) / (n - 1)) / 100 AS covar,
       |  ((sxy - sx * sy / n) / (n - 1))
       |    / (sqrt((sxx - sx * sx / n) / (n - 1))
       |       * sqrt((syy - sy * sy / n) / (n - 1))) AS corr
       |FROM m""".stripMargin
  }

  /** Multiple DISTINCT aggregates beside plain ones in a single GROUP BY —
    * Catalyst plans this with one Expand (rows replicated per distinct
    * group) + two-level aggregation, keeping each distinct set's dedup
    * map-side partial. The alternative — one self-join per distinct
    * column — would be two extra shuffles at 100 TB. */
  def qMultiDistinct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(
        count_distinct(col("l_partkey")).as("d_parts"),
        count_distinct(col("l_suppkey")).as("d_supps"),
        count_distinct(col("l_partkey"), col("l_suppkey")).as("d_pairs"),
        count(lit(1)).as("n"),
        Oracle.dsum(col("l_quantity")).as("qty"))

  val qMultiDistinctSql: String =
    s"""SELECT l_returnflag AS returnflag,
       |count(DISTINCT l_partkey) AS d_parts,
       |count(DISTINCT l_suppkey) AS d_supps,
       |count(DISTINCT (l_partkey, l_suppkey)) AS d_pairs,
       |count(*) AS n, ${sqlSum("l_quantity")} AS qty
       |FROM lineitem GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multi_distinct" -> (qMultiDistinct _),
    "q_stats"      -> (qStats _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_array_lib"  -> (qArrayLib _),
    "q_datetime"   -> (qDatetime _),
    "q_having"     -> (qHaving _),
    "q_percentile" -> (qPercentile _),
    "q_percentile_disc" -> (qPercentileDisc _),
    "q_asof_join"  -> (qAsOfJoin _),
    "q_asof_forward" -> (qAsOfForward _),
    "q_range_join" -> (qRangeJoin _),
    "q_join_star"  -> (qJoinStar _),
    "q_semi_anti"  -> (qSemiAnti _),
    "q_outer_join" -> (qOuterJoin _),
    "q_full_outer" -> (qFullOuter _),
    "q_window"     -> (qWindow _),
    "q_window_range" -> (qWindowRange _),
    "q_topk"       -> (qTopK _),
    "q_lateral"    -> (qLateral _),
    "q_profile"    -> (qProfile _),
    "q_constraints" -> (qConstraints _),
    "q_set_ops"    -> (qSetOps _),
    "q_set_ops_all" -> (qSetOpsAll _),
    "q_distinct"   -> (qDistinct _),
    "q_rollup"     -> (qRollup _),
    "q_cube"       -> (qCube _),
    "q_scalar_lib" -> (qScalarLib _),
    "q_pivot"      -> (qPivot _),
    "q_unpivot"    -> (qUnpivot _),
    "q_sql"        -> (qSql _))

  val oracle: Map[String, String] = Map(
    "q_multi_distinct" -> qMultiDistinctSql,
    "q_stats"      -> qStatsSql,
    "q_salted_agg" -> qSaltedAggSql,
    "q_salted_join" -> qSaltedJoinSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_array_lib"  -> qArrayLibSql,
    "q_datetime"   -> qDatetimeSql,
    "q_having"     -> qHavingSql,
    "q_percentile" -> qPercentileSql,
    "q_percentile_disc" -> qPercentileDiscSql,
    "q_asof_join"  -> qAsOfJoinSql,
    "q_asof_forward" -> qAsOfForwardSql,
    "q_range_join" -> qRangeJoinSql,
    "q_join_star"  -> qJoinStarSql,
    "q_semi_anti"  -> qSemiAntiSql,
    "q_outer_join" -> qOuterJoinSql,
    "q_full_outer" -> qFullOuterSql,
    "q_window"     -> qWindowSql,
    "q_window_range" -> qWindowRangeSql,
    "q_topk"       -> qTopKSql,
    "q_lateral"    -> qLateralSql,
    "q_profile"    -> qProfileSql,
    "q_constraints" -> qConstraintsSql,
    "q_set_ops"    -> qSetOpsSql,
    "q_set_ops_all" -> qSetOpsAllSql,
    "q_distinct"   -> qDistinctSql,
    "q_rollup"     -> qRollupSql,
    "q_cube"       -> qCubeSql,
    "q_scalar_lib" -> qScalarLibSql,
    "q_pivot"      -> qPivotSql,
    "q_unpivot"    -> qUnpivotSql,
    "q_sql"        -> qSqlSql)
}
