package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary. The driver regenerates
  * /root/testdata/sf* between rounds, and a silent physical-schema change
  * (e.g. events.ts flipping TIMESTAMP(NANOS) -> timestamp[us]) once broke 21
  * queries with opaque analysis errors. This spec fails FIRST, with a message
  * naming the drifted table/column, so the loader shims get fixed before
  * anything downstream runs. */
class FixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  val dir = "/root/testdata/sf0.001"

  /** Column name -> acceptable loaded Spark types. Every encoding listed here
    * must have a corresponding dispatch branch in the loader; a type outside
    * the set means the fixture was regenerated into a layout the loaders do
    * not handle yet. */
  private val expected: Map[String, Map[String, Set[DataType]]] = {
    val ts: Set[DataType] = Set(TimestampType, TimestampNTZType, LongType)
    Map(
      "region" -> Map("r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
      "nation" -> Map("n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
        "n_regionkey" -> Set(IntegerType)),
      "customer" -> Map("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
        "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
        "c_mktsegment" -> Set(StringType)),
      "supplier" -> Map("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
        "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
      "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
        "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
        "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
      "orders" -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
        "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
        "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)),
      "lineitem" -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
        "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
        "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
        "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
        "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
        "l_shipdate" -> ts),
      "events" -> Map("event_id" -> Set(LongType), "ts" -> ts,
        "user_id" -> Set(LongType), "event_type" -> Set(StringType),
        "value" -> Set(DoubleType), "props" -> Set(StringType)),
      "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
        "lang" -> Set(StringType), "source" -> Set(StringType),
        "n_chars" -> Set(LongType)),
      "embeddings" -> Map("vec_id" -> Set(LongType),
        "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
        "label" -> Set(IntegerType))
    )
  }

  test("every fixture table still loads with the schema the loaders dispatch on") {
    for ((table, cols) <- expected) {
      // plain read, OR the legacy-nanos read if the footer has TIMESTAMP(NANOS)
      val schema = scala.util.Try(spark.read.parquet(s"$dir/$table.parquet").schema)
        .getOrElse {
          val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          try spark.read.parquet(s"$dir/$table.parquet").schema
          finally prev match {
            case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
        }
      for ((name, ok) <- cols) {
        assert(schema.fieldNames.contains(name),
          s"FIXTURE REGENERATED: $table.parquet lost column '$name' — " +
            s"check Tables loader shims. Loaded: ${schema.treeString}")
        val got = schema(name).dataType
        assert(ok.contains(got),
          s"FIXTURE REGENERATED: $table.$name now loads as $got (supported: " +
            s"${ok.mkString(", ")}) — update the Tables loader dispatch " +
            "before anything downstream runs.")
      }
    }
  }

  /** sf0.001 row counts pinned exactly: a truncated or regenerated
    * fixture with an IDENTICAL schema would silently shift every oracle
    * hash — the schema canary above cannot see it, this one fails first
    * with the table named. (The driver generates deterministically at
    * seed 42, so identical counts are the contract, not a coincidence.) */
  private val expectedRows: Map[String, Long] = Map(
    "region" -> 5L, "nation" -> 25L, "customer" -> 150L, "supplier" -> 10L,
    "part" -> 200L, "orders" -> 1500L, "lineitem" -> 6000L,
    "events" -> 1000L, "documents" -> 500L, "embeddings" -> 500L)

  test("every fixture table still has its seed-42 row count") {
    for ((table, n) <- expectedRows) {
      // same legacy-nanos fallback as the schema canary: a count must
      // not be blocked by a ts re-encoding (that drift has its own test)
      val got = scala.util.Try(
          spark.read.parquet(s"$dir/$table.parquet").count())
        .getOrElse {
          val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          try spark.read.parquet(s"$dir/$table.parquet").count()
          finally prev match {
            case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
        }
      assert(got == n,
        s"FIXTURE REGENERATED: $table.parquet has $got rows (expected $n) — " +
          "every oracle hash downstream is suspect; re-baseline deliberately " +
          "or restore the fixture before trusting the round's correctness.")
    }
  }

  /** The `boundedSlice` caps on the `_verified` refutation companions
    * silently define what the correctness gate certifies: at the gate sf
    * every companion's slice must be the FULL corpus (n ≤ cap), so the
    * gate's hash-pass covers the complete production emitted set. A
    * fixture regeneration that grows the gate corpus past the cap would
    * QUIETLY shrink that coverage to a sample — this canary makes it
    * loud instead. (sf0.1 exceeding the cap is expected and fine: the
    * bench/scale sf runs companions on the documented bounded slice.) */
  test("companion slices still cover the full correctness-gate corpus") {
    val gateDir = "/root/testdata/sf0.01"
    val n = spark.read.parquet(s"$gateDir/documents.parquet").count()
    assert(n <= graft.queries.ExtQueries.CompanionCap,
      s"GATE COVERAGE SHRUNK: $gateDir/documents.parquet has $n docs, " +
        s"above the ${graft.queries.ExtQueries.CompanionCap}-doc companion " +
        "slice cap — the _verified companions would certify a SAMPLE at " +
        "the gate sf. Raise the cap (and re-check companion runtimes) or " +
        "re-baseline deliberately.")
  }

  test("Tables.events normalizes ts to the session TimestampType on the " +
       "current fixture AND on the legacy int64-nanos layout") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"Tables.events must land on TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.count() > 0)
    // legacy layout round-trip: raw int64 epoch-nanos must normalize to the
    // same instants the current fixture encoding yields
    val tmp = java.nio.file.Files.createTempDirectory("graft_evfix").toString
    Tables.events(spark, dir)
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val legacy = Tables.events(spark, tmp)
    assert(legacy.schema("ts").dataType == TimestampType)
    val a = ev.select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toSet
    val b = legacy.select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toSet
    assert(a == b, "nanos layout must decode to identical instants")
  }
}
