package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up for SCALE REHEARSALS: replicate the
  * driver-generated sf0.1 tables `factor`× with consistent key
  * remapping, so per-query cost slopes can be measured one decade above
  * the bench sf without touching the read-only fixtures.
  *
  * Replication scheme (copy index i = 0..factor-1; copy 0 is the
  * original bytes):
  *  - fixed dimensions (`region`, `nation`) copy through unchanged —
  *    they do not scale with sf in a TPC-H-shaped schema;
  *  - every scaling table's PRIMARY key shifts by i·stride, and every
  *    FOREIGN key shifts by the SAME i·stride of its target, so each
  *    copy is a self-consistent shard: join fan-outs, key skew and
  *    group cardinalities per copy are exactly the original's;
  *  - `documents.text` gets a one-token copy prefix (`v<i> `), so exact
  *    dedup stays duplicate-free across copies while near-dup operators
  *    see realistic cross-copy clusters (a crawl at 10× the size has
  *    MORE near-duplicates, not proportionally many — that asymmetry is
  *    part of what a scale rehearsal must exercise); `n_chars` is
  *    recomputed to stay consistent;
  *  - `events` timestamps keep their window: 10× the events in the same
  *    wall-clock span is denser traffic, the realistic way an event
  *    stream grows; `user_id` shifts per copy so session/user counts
  *    scale rather than session lengths.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <factor> */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, factorS.toInt)
    spark.stop()
  }

  /** The scale-up itself, session provided by the caller (tests). */
  def run(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    require(factor >= 1, "factor must be >= 1")

    // strides: comfortably above each table's max key at any plausible sf
    val Cust = 10_000_000L
    val Ord = 100_000_000L
    val PartK = 10_000_000L
    val Supp = 1_000_000L
    val Ev = 100_000_000L
    val Doc = 100_000_000L
    val Vec = 10_000_000L

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until factor).map(i => f(base, i)).reduce(_ unionByName _), t)
      println(s"[scaleup] $t done")
    }
    def shift(c: String, stride: Long, i: Int): Column =
      (col(c) + lit(stride * i)).as(c)

    write(read("region"), "region")
    write(read("nation"), "nation")

    // shift the named keys in place, keep every column in table order
    def shiftKeys(d: DataFrame, i: Int, keys: (String, Long)*): DataFrame = {
      val m = keys.toMap
      d.select(d.columns.toSeq.map { c =>
        m.get(c).map(s => shift(c, s, i)).getOrElse(col(c))
      }: _*)
    }

    replicate("customer")(shiftKeys(_, _, "c_custkey" -> Cust))
    replicate("supplier")(shiftKeys(_, _, "s_suppkey" -> Supp))
    replicate("part")(shiftKeys(_, _, "p_partkey" -> PartK))
    replicate("orders")(
      shiftKeys(_, _, "o_orderkey" -> Ord, "o_custkey" -> Cust))
    replicate("lineitem")(shiftKeys(_, _,
      "l_orderkey" -> Ord, "l_partkey" -> PartK, "l_suppkey" -> Supp))
    replicate("events")(
      shiftKeys(_, _, "event_id" -> Ev, "user_id" -> Cust))
    replicate("documents") { (d, i) =>
      val txt = if (i == 0) col("text")
        else concat(lit(s"v$i "), col("text"))
      d.select(shift("doc_id", Doc, i), txt.as("text"),
          col("lang"), col("source"), length(txt).cast("long").as("n_chars"))
    }
    replicate("embeddings")(shiftKeys(_, _, "vec_id" -> Vec))
  }
}
