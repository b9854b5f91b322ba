package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Helpers shared by the driver-checked queries.
  *
  * Oracle-parity note on floating point: per-row double arithmetic is
  * IEEE-deterministic and matches DuckDB bit-for-bit, but a double SUM
  * depends on accumulation order (partitions), so every double sum goes
  * through an exact decimal: `sum(CAST(x AS DECIMAL(27,7)))` then back to
  * double. The fixture values carry ≤6 true decimal digits, so the
  * scale-7 cast is exact and order-independent in both engines. */
object Oracle {
  /** Order-independent, DuckDB-exact sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(27, 7))).cast(DoubleType)

  /** Same trick for AVG: exact sum / count, final op a single double divide. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(27, 7))).cast(DoubleType) / count(lit(1))

  /** DuckDB-side twin of [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(27,7))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(27,7))) AS DOUBLE) / count(*)"

  /** Nested-output parity: the driver's comparator hashes result values with
    * pandas, which cannot hash ARRAY/STRUCT/MAP cells — so every query that
    * produces nested data serializes it with `to_json` on BOTH sides (DuckDB's
    * `to_json` emits the same compact JSON as Spark's). Float/double leaves are
    * quantized to micro-unit integers first ([[q6]]/[[sqlQ6]]): integer JSON
    * text is formatting-proof, while float→text shortest-roundtrip rules
    * differ between engines. floor() is used because both engines define it
    * identically (DuckDB's double→int CAST rounds, Spark's truncates). */
  def q6(c: Column): Column = floor(c * lit(1e6)).cast(org.apache.spark.sql.types.LongType)
  // The inner DOUBLE cast is load-bearing: DuckDB evaluates FLOAT * 1000000.0
  // in float32 (typeof = FLOAT), while Spark promotes to double.
  def sqlQ6(expr: String): String =
    s"CAST(floor(CAST(($expr) AS DOUBLE) * 1000000.0) AS BIGINT)"
}
