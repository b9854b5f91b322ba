package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader (TESTDATA.md). All queries read through here so the
  * scan layer stays in one place (predicate pushdown / column pruning are
  * Catalyst's job — we just hand it plain parquet scans). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in three physical encodings across fixture
    * regenerations: TIMESTAMP(NANOS) (rejected by Spark's reader unless the
    * legacy nanos-as-long flag is set), raw int64 epoch-nanos, and — current
    * fixtures — plain timestamp[us] (read as TIMESTAMP_NTZ). Dispatch on the
    * schema that actually loads so a regeneration can never silently break
    * every events-reading query again. All branches land on the session
    * TimestampType at µs precision (UTC session), matching the DuckDB
    * oracle's `ts::TIMESTAMP`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val path = s"$dir/events.parquet"
    val plain = scala.util.Try(spark.read.parquet(path).schema("ts").dataType)
    plain match {
      case scala.util.Success(TimestampType) =>
        spark.read.parquet(path)
      case scala.util.Success(TimestampNTZType) =>
        // UTC session ⇒ NTZ local datetime and the tz-aware instant coincide
        spark.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
      case scala.util.Success(LongType) =>
        // epoch-nanos as int64 (PropertySpec temp fixtures use this layout).
        // Integer div, NOT `/`: float division of epoch-nanos (~1.7e18) loses
        // precision beyond double's 53-bit mantissa and corrupts microseconds.
        spark.read.parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case scala.util.Success(other) =>
        sys.error(s"events.parquet: unsupported physical type for ts: $other" +
          " — fixture regenerated? Check Tables.events dispatch.")
      case scala.util.Failure(_) =>
        // schema conversion itself failed: TIMESTAMP(NANOS) physical type,
        // readable only as long nanos under the legacy flag
        val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try
          spark.read.parquet(path)
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
          case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        }
    }
  }
}
