package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.dsl._
import graft.exec.Wrangle
import graft.functions.Registry
import graft.model.{Model, PipelineSpec}

/** Driver-checked queries finishing the §2.3 inventory: collection and
  * restructuring operators (Filter/Map/ForEach/Flatten/Gather/FoldInKeys/
  * FoldInValue/GetKeys/GetValues), CreateMultiple, the set-oriented
  * GetOrCreateMultiple, and the explicit udf (`Custom`) escape hatch. */
object OpsQueries {

  Registry.register("x2", DoubleType)(c => c.cast(DoubleType) * 2)
  // True Scala-lambda udf — the reference's arbitrary-callable `Custom`
  // (transformations.py:72-77). Registered once; the preferred path for
  // everything else is Column functions (codegen'd).
  Registry.registerUdf("rev_udf", udf((s: String) => if (s == null) null else s.reverse),
    StringType)

  /** Filter (intended semantics) / Map / ForEach(Create) over the
    * `embeddings.embedding` float array (§2.3 #8,9,10). */
  def qArrayOps(s: SparkSession, dir: String): DataFrame = {
    val spec = PipelineSpec(
      Model("Pt")(
        "v"   -> Id,
        "neg" -> Fn("negate")),
      Model("Emb")(
        "vec_id" -> Get("vec_id"),
        "pos"    -> (Get("embedding") | FilterT(Cmp(">", 0f))),
        "scaled" -> (Get("embedding") | MapT(Fn("x2"))),
        "pts"    -> (Get("embedding") | FilterT(Cmp(">", 0.25f)) | ForEach(Create("Pt"))),
        "first"  -> (Get("embedding") | Get(0)),
        "last"   -> (Get("embedding") | Get(-1))))
    Wrangle.wrangle(Tables(s, dir, "embeddings"), spec, "Emb")
      // Nested outputs serialize to quantized JSON for the driver's
      // comparator (Oracle.q6 doc); scalar floats stay raw.
      .select(
        col("vec_id"),
        to_json(transform(col("pos"), x => Oracle.q6(x))).as("pos"),
        to_json(transform(col("scaled"), x => Oracle.q6(x))).as("scaled"),
        to_json(transform(col("pts"), p => struct(
          Oracle.q6(p.getField("v")).as("v"),
          Oracle.q6(p.getField("neg")).as("neg")))).as("pts"),
        col("first"), col("last"))
  }

  private def Q(e: String): String = Oracle.sqlQ6(e)

  val qArrayOpsSql: String =
    s"""SELECT vec_id,
       |to_json(list_transform(list_filter(embedding, x -> x > 0), x -> ${Q("x")})) AS pos,
       |to_json(list_transform(embedding, x -> ${Q("CAST(x AS DOUBLE) * 2")})) AS scaled,
       |to_json(list_transform(list_filter(embedding, x -> x > 0.25),
       |  x -> {'v': ${Q("x")}, 'neg': ${Q("-x")}})) AS pts,
       |embedding[1] AS first,
       |embedding[-1] AS last
       |FROM embeddings""".stripMargin

  /** Flatten (§2.3 #11): one level and depth=2 over inline nesting. */
  def qFlatten(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "embeddings").select(
      col("vec_id"),
      array(array(slice(col("embedding"), 1, 2), slice(col("embedding"), 3, 2)),
        array(slice(col("embedding"), 5, 1))).as("deep"))
    val spec = PipelineSpec(
      Model("M")(
        "vec_id" -> Get("vec_id"),
        "once"   -> (Get("deep") | Flatten()),
        "twice"  -> (Get("deep") | Flatten(2))))
    Wrangle.wrangle(df, spec, "M")
      .select(
        col("vec_id"),
        to_json(transform(col("once"), a => transform(a, x => Oracle.q6(x)))).as("once"),
        to_json(transform(col("twice"), x => Oracle.q6(x))).as("twice"))
  }

  val qFlattenSql: String =
    s"""SELECT vec_id,
       |to_json([list_transform(embedding[1:2], x -> ${Q("x")}),
       |         list_transform(embedding[3:4], x -> ${Q("x")}),
       |         list_transform(embedding[5:5], x -> ${Q("x")})]) AS once,
       |to_json(list_transform(embedding[1:5], x -> ${Q("x")})) AS twice
       |FROM embeddings""".stripMargin

  /** Map restructuring ops over a MAP<STRING, STRUCT> built from `nation`
    * (§2.3 #12-16): Gather on a map, FoldInKeys, FoldInValue, GetKeys,
    * GetValues. */
  def qMapOps(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "nation").select(
      col("n_nationkey"),
      map(
        lit("name"), struct(col("n_name").as("s")),
        lit("region"), struct(col("n_regionkey").cast(StringType).as("s")),
        lit("meta"), struct(lit("fixture").as("s"))).as("m"))
    val spec = PipelineSpec(
      Model("M")(
        "key"    -> Get("n_nationkey"),
        "gathered" -> (Get("m") | Gather(Seq("name", "region"))),
        "folded" -> (Get("m") | FoldInKeys("k")),
        "broad"  -> (Get("m") | FoldInValue("meta", "src")),
        "keys"   -> (Get("m") | GetKeys),
        "vals"   -> (Get("m") | GetValues | MapT(Get("s")))))
    Wrangle.wrangle(df, spec, "M")
      .select(col("key") +: Seq("gathered", "folded", "broad", "keys", "vals")
        .map(c => to_json(col(c)).as(c)): _*)
  }

  val qMapOpsSql: String =
    """SELECT n_nationkey AS key,
      |to_json(MAP {'name': {'s': n_name}, 'region': {'s': CAST(n_regionkey AS VARCHAR)}}) AS gathered,
      |to_json([{'k': 'name', 's': n_name}, {'k': 'region', 's': CAST(n_regionkey AS VARCHAR)},
      | {'k': 'meta', 's': 'fixture'}]) AS folded,
      |to_json(MAP {'name': {'src': {'s': 'fixture'}, 's': n_name},
      |     'region': {'src': {'s': 'fixture'}, 's': CAST(n_regionkey AS VARCHAR)}}) AS broad,
      |to_json(['name', 'region', 'meta']) AS keys,
      |to_json([n_name, CAST(n_regionkey AS VARCHAR), 'fixture']) AS vals
      |FROM nation""".stripMargin

  /** CreateMultiple (§2.3 #19): one child record per datapoint of an inline
    * sequence, with a registered-udf field (`Custom`, §2.3 #4). */
  def qCreateMultiple(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "orders").select(
      col("o_orderkey"),
      array(
        struct(lit("ship").as("kind"), col("o_orderkey").as("key")),
        struct(lit("bill").as("kind"), col("o_custkey").as("key"))).as("contacts"))
    val spec = PipelineSpec(
      Model("Contact")(
        "kind" -> (Get("kind") | Fn("upper")),
        "rkind" -> (Get("kind") | Fn("rev_udf")),
        "key"  -> Get("key")),
      Model("Order")(
        "okey"     -> Get("o_orderkey"),
        "contacts" -> (Get("contacts") | CreateMultiple("Contact"))))
    Wrangle.wrangle(df, spec, "Order")
      .withColumn("contacts", to_json(col("contacts")))
  }

  val qCreateMultipleSql: String =
    """SELECT o_orderkey AS okey,
      |to_json([{'kind': 'SHIP', 'rkind': 'pihs', 'key': o_orderkey},
      | {'kind': 'BILL', 'rkind': 'llib', 'key': o_custkey}]) AS contacts
      |FROM orders""".stripMargin

  /** GetOrCreateMultiple (§2.3 #21) set-oriented: every order's custkey
    * probes a partial customer dimension; duplicates keep one result per
    * incoming datapoint, like the reference's lazy per-row map
    * (pipeline.py:85-104). */
  def qGetOrCreateMultiple(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val customer = Tables(s, dir, "customer")
    val spec = PipelineSpec(
      Model("Cust")(
        "custkey" -> Get("o_custkey"),
        "name"    -> (Get("o_custkey") | CastTo(StringType) | Fn("cust_tag")),
        "acctbal" -> Constant(0.0)))
    val incoming = Wrangle.wrangle(orders, spec, "Cust")
    val dim = customer.select(
        col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
      .filter(col("custkey") % 5 =!= 0)
    Wrangle.getOrCreate(incoming, dim, Seq("custkey"))
  }

  Registry.register("cust_tag", StringType)(c => concat(lit("CUST-"), c))

  val qGetOrCreateMultipleSql: String =
    """SELECT o.o_custkey AS custkey,
      |CASE WHEN d.c_custkey IS NOT NULL THEN d.c_name
      |     ELSE concat('CUST-', CAST(o.o_custkey AS VARCHAR)) END AS name,
      |CASE WHEN d.c_custkey IS NOT NULL THEN d.c_acctbal ELSE 0.0 END AS acctbal,
      |(d.c_custkey IS NULL) AS created
      |FROM orders o
      |LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 5 <> 0) d
      |ON o.o_custkey = d.c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_ops"        -> (qArrayOps _),
    "q_flatten"          -> (qFlatten _),
    "q_map_ops"          -> (qMapOps _),
    "q_create_multiple"  -> (qCreateMultiple _),
    "q_get_or_create_multiple" -> (qGetOrCreateMultiple _))

  val oracle: Map[String, String] = Map(
    "q_array_ops"        -> qArrayOpsSql,
    "q_flatten"          -> qFlattenSql,
    "q_map_ops"          -> qMapOpsSql,
    "q_create_multiple"  -> qCreateMultipleSql,
    "q_get_or_create_multiple" -> qGetOrCreateMultipleSql)
}
