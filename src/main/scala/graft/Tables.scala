package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader (TESTDATA.md). All queries read through here so the
  * scan layer stays in one place (predicate pushdown / column pruning are
  * Catalyst's job — we just hand it plain parquet scans). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects by default; read it as long nanos and derive
    * a microsecond timestamp — the DuckDB oracle casts to TIMESTAMP (µs)
    * for the same truncation. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      // integer div, NOT `/`: float division of epoch-nanos (~1.7e18) loses
      // precision beyond double's 53-bit mantissa and corrupts microseconds
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }
}
