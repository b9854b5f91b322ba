package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.dsl._
import graft.exec.Wrangle
import graft.functions.Registry
import graft.model.{Model, PipelineSpec}
import Oracle._

/** Driver-checked queries for the reference's core operator inventory
  * (SURVEY.md §2.1-§2.3): every transformation node exercised through the
  * DSL → compiler → one declarative Spark plan, with a DuckDB-expressible
  * oracle for each. */
object CoreQueries {

  // Row-level functions used via the Fn (Custom/Cast-callable) escape hatch —
  // all built from codegen'd built-ins, no udfs.
  Registry.register("disc_price", DoubleType) { row =>
    row.getField("l_extendedprice") * (lit(1.0) - row.getField("l_discount"))
  }
  Registry.register("charge", DoubleType) { row =>
    row.getField("l_extendedprice") * (lit(1.0) - row.getField("l_discount")) *
      (lit(1.0) + row.getField("l_tax"))
  }

  /** Flagship: the reference's canonical batch path (wrangle ≡
    * create_multiple) feeding the engine's aggregation surface — TPC-H Q1
    * shape on `lineitem`. */
  def q1(s: SparkSession, dir: String): DataFrame = {
    val spec = PipelineSpec(
      Model("Line")(
        "returnflag" -> Get("l_returnflag"),
        "linestatus" -> Get("l_linestatus"),
        "quantity"   -> Get("l_quantity"),
        "price"      -> Get("l_extendedprice"),
        "discount"   -> Get("l_discount"),
        "disc_price" -> Fn("disc_price"),
        "charge"     -> Fn("charge"),
        "shipdate"   -> Get("l_shipdate")))
    Wrangle.wrangle(Tables(s, dir, "lineitem"), spec, "Line")
      .filter(col("shipdate") <= lit("1998-09-01").cast(TimestampType))
      .groupBy(col("returnflag"), col("linestatus"))
      .agg(
        dsum(col("quantity")).as("sum_qty"),
        dsum(col("price")).as("sum_base_price"),
        dsum(col("disc_price")).as("sum_disc_price"),
        dsum(col("charge")).as("sum_charge"),
        davg(col("quantity")).as("avg_qty"),
        davg(col("price")).as("avg_price"),
        davg(col("discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String =
    s"""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       |${sqlSum("l_quantity")} AS sum_qty,
       |${sqlSum("l_extendedprice")} AS sum_base_price,
       |${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |${sqlAvg("l_quantity")} AS avg_qty,
       |${sqlAvg("l_extendedprice")} AS avg_price,
       |${sqlAvg("l_discount")} AS avg_disc,
       |count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
       |GROUP BY 1, 2""".stripMargin

  /** Id + Constant + Chain(Get|Cast) in one model (§2.3 #1,2,3; chain §2.2). */
  def qScalar(s: SparkSession, dir: String): DataFrame = {
    val spec = PipelineSpec(
      Model("Row")(
        "okey"    -> Get("l_orderkey"),
        "lnum"    -> (Get("l_linenumber") | Id),
        "tag"     -> Constant("graft"),
        // Decimal cast exercised, but emitted as DOUBLE: the driver's pandas
        // comparator hashes DECIMAL cells differently across engines.
        "qty_int" -> (Get("l_quantity") | CastTo(DecimalType(12, 2)) | CastTo(DoubleType)),
        "qty_str" -> (Get("l_linenumber") | CastTo(StringType))))
    Wrangle.wrangle(Tables(s, dir, "lineitem"), spec, "Row")
  }

  val qScalarSql: String =
    """SELECT l_orderkey AS okey, l_linenumber AS lnum, 'graft' AS tag,
      |CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_int,
      |CAST(l_linenumber AS VARCHAR) AS qty_str
      |FROM lineitem""".stripMargin

  /** Get with JSON-string dispatch over `events.props` (§2.3 #6) plus a
    * map-style default. */
  def qGetJson(s: SparkSession, dir: String): DataFrame = {
    val spec = PipelineSpec(
      Model("Ev")(
        "event_id" -> Get("event_id"),
        "k"        -> (Get("props") | Get("k")),
        "missing"  -> (Get("props") | Get("nope", default = Some("fallback")))))
    Wrangle.wrangle(Tables.events(s, dir), spec, "Ev")
  }

  val qGetJsonSql: String =
    """SELECT event_id,
      |CAST(json_extract(props, '$.k') AS VARCHAR) AS k,
      |COALESCE(json_extract_string(props, '$.nope'), 'fallback') AS missing
      |FROM events""".stripMargin

  /** Default with Python-truthiness (0 and NULL both fall back — §2.3 #5)
    * and If with the NULL-on-missing-else branch (§2.3 #17). */
  def qDefaultIf(s: SparkSession, dir: String): DataFrame = {
    val spec = PipelineSpec(
      Model("Ev")(
        "event_id" -> Get("event_id"),
        "v"        -> (Get("value") | Default(-1.0)),
        "bucket"   -> (Get("value") | If(Cmp(">", 100.0), Constant("big"),
                         Some(Constant("small")))),
        "flag"     -> (Get("event_type") | If(Cmp("==", "purchase"), Constant(1L)))))
    Wrangle.wrangle(Tables.events(s, dir), spec, "Ev")
  }

  val qDefaultIfSql: String =
    """SELECT event_id,
      |CASE WHEN value IS NULL OR value = 0 THEN -1.0 ELSE value END AS v,
      |CASE WHEN value > 100.0 THEN 'big' ELSE 'small' END AS bucket,
      |CASE WHEN event_type = 'purchase' THEN 1 END AS flag
      |FROM events""".stripMargin

  /** Create (nested model recursion, §2.3 #18) + Attr (§2.3 #7) + Gather on
    * the row struct (§2.3 #12). */
  def qCreate(s: SparkSession, dir: String): DataFrame = {
    val spec = PipelineSpec(
      Model("Info")(
        "nk"  -> Get("c_nationkey"),
        "seg" -> Get("c_mktsegment")),
      Model("Cust")(
        "key"   -> Get("c_custkey"),
        "info"  -> Create("Info"),
        "seg2"  -> (Create("Info") | Attr("seg")),
        "ident" -> (Gather(Seq("c_custkey", "c_name")) | Get("c_name"))))
    Wrangle.wrangle(Tables(s, dir, "customer"), spec, "Cust")
      // Nested outputs serialize to JSON for the driver's comparator (Oracle.q6 doc)
      .withColumn("info", to_json(col("info")))
  }

  val qCreateSql: String =
    """SELECT c_custkey AS key,
      |to_json({'nk': c_nationkey, 'seg': c_mktsegment}) AS info,
      |c_mktsegment AS seg2,
      |c_name AS ident
      |FROM customer""".stripMargin

  /** GetOrCreate(Multiple) as the set-oriented left-outer join (§2.1,
    * §2.3 #20-21): probe built customer records against a partial dimension;
    * hits keep the stored record, misses keep the built one, `created`
    * flags the misses. */
  def qGetOrCreate(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables(s, dir, "customer")
    val spec = PipelineSpec(
      Model("Cust")(
        "custkey" -> Get("c_custkey"),
        "name"    -> (Get("c_name") | Fn("upper")),
        "acctbal" -> Get("c_acctbal")))
    val incoming = Wrangle.wrangle(customer, spec, "Cust")
    val dim = customer.select(
        col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
      .filter(col("custkey") % 3 =!= 0)
    Wrangle.getOrCreate(incoming, dim, Seq("custkey"))
  }

  val qGetOrCreateSql: String =
    """SELECT b.c_custkey AS custkey,
      |CASE WHEN d.c_custkey IS NOT NULL THEN d.c_name ELSE upper(b.c_name) END AS name,
      |CASE WHEN d.c_custkey IS NOT NULL THEN d.c_acctbal ELSE b.c_acctbal END AS acctbal,
      |(d.c_custkey IS NULL) AS created
      |FROM customer b
      |LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 <> 0) d
      |ON b.c_custkey = d.c_custkey""".stripMargin

  /** Permissive error mode (reference §1.3): a row-dependent cast failure
    * yields NULL plus the (model, field, op) provenance triple in the
    * `_errors` column, instead of failing the job. */
  def qPermissive(s: SparkSession, dir: String): DataFrame = {
    val shaped = Tables.events(s, dir).select(
      col("event_id"),
      when(col("event_id") % 3 === 0, lit("xx")).otherwise(lit("12")).as("s"),
      col("value"))
    val spec = PipelineSpec(
      Model("Ev")(
        "id" -> Get("event_id"),
        "n"  -> (Get("s") | CastTo(LongType)),
        "v"  -> Get("value")))
    Wrangle.wrangle(shaped, spec, "Ev", Wrangle.Permissive)
      .withColumn(Wrangle.ErrorsCol, to_json(col(Wrangle.ErrorsCol)))
  }

  val qPermissiveSql: String =
    """SELECT event_id AS id,
      |CASE WHEN event_id % 3 = 0 THEN NULL ELSE 12 END AS n,
      |value AS v,
      |CASE WHEN event_id % 3 = 0
      |     THEN to_json([{'model': 'Ev', 'field': 'n', 'op': 'CastTo'}])
      |     ELSE '[]' END AS "_errors"
      |FROM events""".stripMargin

  /** Permissive twin on `lineitem` — the §1.3 error channel must never hang
    * off a single fixture table (the events regeneration blacked it out for a
    * whole round). Same contract: row-dependent bad cast → NULL + provenance
    * triple in `_errors`, job keeps running. */
  def qPermissiveLineitem(s: SparkSession, dir: String): DataFrame = {
    val shaped = Tables(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_orderkey") % 5 === 0, lit("bad"))
        .otherwise(col("l_linenumber").cast(StringType)).as("s"),
      col("l_quantity"))
    val spec = PipelineSpec(
      Model("Line")(
        "okey" -> Get("l_orderkey"),
        "lnum" -> Get("l_linenumber"),
        "n"    -> (Get("s") | CastTo(LongType)),
        "qty"  -> Get("l_quantity")))
    Wrangle.wrangle(shaped, spec, "Line", Wrangle.Permissive)
      .withColumn(Wrangle.ErrorsCol, to_json(col(Wrangle.ErrorsCol)))
  }

  val qPermissiveLineitemSql: String =
    """SELECT l_orderkey AS okey, l_linenumber AS lnum,
      |CASE WHEN l_orderkey % 5 = 0 THEN NULL ELSE l_linenumber END AS n,
      |l_quantity AS qty,
      |CASE WHEN l_orderkey % 5 = 0
      |     THEN to_json([{'model': 'Line', 'field': 'n', 'op': 'CastTo'}])
      |     ELSE '[]' END AS "_errors"
      |FROM lineitem""".stripMargin

  /** Permissive provenance THROUGH a GetOrCreate join (§1.3 × §2.1): the
    * `_errors` channel must survive relational composition, not just a
    * terminal projection. Incoming records are permissive-wrangled (bad
    * cast on custkey ≡ 0 mod 4 → NULL + provenance triple), then probed
    * against a partial dimension: hits keep the STORED record (whose
    * `_errors` is the stored empty set), misses keep the built record
    * WITH its provenance — so rows at custkey ≡ 0 mod 12 carry their
    * error triple out through the join. */
  def qPermissiveGoc(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables(s, dir, "customer")
    val shaped = customer.select(
      col("c_custkey"), col("c_name"),
      when(col("c_custkey") % 4 === 0, lit("bad"))
        .otherwise((col("c_custkey") % 100).cast(StringType)).as("s"))
    val spec = PipelineSpec(
      Model("Cust")(
        "custkey" -> Get("c_custkey"),
        "name"    -> (Get("c_name") | Fn("upper")),
        "n"       -> (Get("s") | CastTo(LongType))))
    val incoming = Wrangle.wrangle(shaped, spec, "Cust", Wrangle.Permissive)
    val dim = customer.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        (col("c_custkey") % 100).cast(LongType).as("n"),
        array().cast("array<struct<model:string,field:string,op:string>>")
          .as(Wrangle.ErrorsCol))
    Wrangle.getOrCreate(incoming, dim, Seq("custkey"))
      .withColumn(Wrangle.ErrorsCol, to_json(col(Wrangle.ErrorsCol)))
  }

  val qPermissiveGocSql: String =
    """SELECT b.custkey,
      |CASE WHEN d.c_custkey IS NOT NULL THEN d.c_name ELSE b.name END AS name,
      |CASE WHEN d.c_custkey IS NOT NULL THEN d.n ELSE b.n END AS n,
      |CASE WHEN d.c_custkey IS NOT NULL THEN '[]' ELSE b.err END AS "_errors",
      |(d.c_custkey IS NULL) AS created
      |FROM (SELECT c_custkey AS custkey, upper(c_name) AS name,
      |        CASE WHEN c_custkey % 4 = 0 THEN NULL
      |             ELSE c_custkey % 100 END AS n,
      |        CASE WHEN c_custkey % 4 = 0
      |             THEN to_json([{'model': 'Cust', 'field': 'n', 'op': 'CastTo'}])
      |             ELSE '[]' END AS err
      |      FROM customer) b
      |LEFT JOIN (SELECT c_custkey, c_name, c_custkey % 100 AS n
      |           FROM customer WHERE c_custkey % 3 <> 0) d
      |ON b.custkey = d.c_custkey""".stripMargin

  /** Default/If twin on `orders` — ops §2.3 #5/#17 likewise get a second
    * fixture table so one regeneration can't zero their driver coverage.
    * The shaping synthesizes NULL and 0 rows to exercise BOTH truthiness
    * fallbacks. */
  def qDefaultIfOrders(s: SparkSession, dir: String): DataFrame = {
    val shaped = Tables(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast(DoubleType))
        .when(col("o_orderkey") % 7 === 1, lit(0.0))
        .otherwise(col("o_totalprice")).as("maybe"))
    val spec = PipelineSpec(
      Model("Ord")(
        "okey"   -> Get("o_orderkey"),
        "v"      -> (Get("maybe") | Default(-1.0)),
        "bucket" -> (Get("o_totalprice") | If(Cmp(">", 150000.0),
                       Constant("big"), Some(Constant("small")))),
        "flag"   -> (Get("o_orderstatus") | If(Cmp("==", "F"), Constant(1L)))))
    Wrangle.wrangle(shaped, spec, "Ord")
  }

  val qDefaultIfOrdersSql: String =
    """SELECT o_orderkey AS okey,
      |CASE WHEN o_orderkey % 7 = 0 THEN -1.0
      |     WHEN o_orderkey % 7 = 1 THEN -1.0
      |     ELSE o_totalprice END AS v,
      |CASE WHEN o_totalprice > 150000.0 THEN 'big' ELSE 'small' END AS bucket,
      |CASE WHEN o_orderstatus = 'F' THEN 1 END AS flag
      |FROM orders""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_permissive"    -> (qPermissive _),
    "q_permissive_li" -> (qPermissiveLineitem _),
    "q_permissive_goc" -> (qPermissiveGoc _),
    "q_default_if_ord" -> (qDefaultIfOrders _),
    "q1_agg"          -> (q1 _),
    "q_scalar"        -> (qScalar _),
    "q_get_json"      -> (qGetJson _),
    "q_default_if"    -> (qDefaultIf _),
    "q_create"        -> (qCreate _),
    "q_get_or_create" -> (qGetOrCreate _))

  val oracle: Map[String, String] = Map(
    "q_permissive"    -> qPermissiveSql,
    "q_permissive_li" -> qPermissiveLineitemSql,
    "q_permissive_goc" -> qPermissiveGocSql,
    "q_default_if_ord" -> qDefaultIfOrdersSql,
    "q1_agg"          -> q1Sql,
    "q_scalar"        -> qScalarSql,
    "q_get_json"      -> qGetJsonSql,
    "q_default_if"    -> qDefaultIfSql,
    "q_create"        -> qCreateSql,
    "q_get_or_create" -> qGetOrCreateSql)
}
