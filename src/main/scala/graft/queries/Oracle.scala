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
  /** Order-independent, DuckDB-exact sum of a double expression.
    *
    * The quantization to 7 decimals happens in DOUBLE space with
    * `floor(x·1e7 + 0.5)` — not via the double→DECIMAL cast — because
    * the engines' casts round ties differently (Spark HALF_UP, DuckDB
    * banker's): a three-factor product like TPC-H q1's `charge` lands
    * exactly on a .xxxxxxx5 boundary once per few hundred thousand rows
    * (the sf0.1 rehearsal caught one), and the two casts then disagree
    * by 1e-7. `floor` on the identical IEEE double is the same number
    * on both engines, every time; the quantized units are summed as
    * exact integers (DECIMAL(27,0) so 10^13 rows cannot overflow) and
    * rescaled once. Fixture values carry ≤6 true decimal digits, so for
    * raw columns the quantization is exact and this equals the plain
    * decimal sum. */
  def dsum(c: Column): Column =
    (sum(floor(c * lit(1e7) + lit(0.5)).cast(DecimalType(27, 0)))
      .cast(DoubleType) / lit(1e7))

  /** Same trick for AVG: exact quantized sum / count, final op a double
    * divide. */
  def davg(c: Column): Column =
    sum(floor(c * lit(1e7) + lit(0.5)).cast(DecimalType(27, 0)))
      .cast(DoubleType) / lit(1e7) / count(lit(1))

  /** DuckDB-side twin of [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(sum(CAST(floor(($expr) * 10000000.0 + 0.5) AS DECIMAL(27,0))) AS DOUBLE) / 10000000.0"
  def sqlAvg(expr: String): String =
    s"${sqlSum(expr)} / count(*)"

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
