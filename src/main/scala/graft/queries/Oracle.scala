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
}
