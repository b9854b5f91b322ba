package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Order-preserving IEEE-754 bit image of a double: a LONG `b` such that
  * `x < y ⟺ bits(x) < bits(y)` (signed comparison), via the classic
  * transform `raw ^ ((raw >> 63) & Long.MaxValue)` — positives keep their
  * bit pattern, negatives get their magnitude bits flipped so their order
  * reverses into place below the positives.
  *
  * Why it exists: histogram partitioners that subdivide the VALUE range
  * linearly collapse on heavy-tailed data (one huge outlier makes every
  * other value share cell 0). Bit space is exponent-first — effectively
  * logarithmic resolution near the mass of any smoothly-distributed data —
  * so subdividing the BIT range spreads exponential and power-law values
  * across cells (see [[graft.exec.RankBoundaries]]). Monotonicity is the
  * only contract callers rely on; NaNs order above +Infinity, which is
  * Spark's own sort order for doubles. */
case class OrderedDoubleBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected DOUBLE input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val raw = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    raw ^ ((raw >> 63) & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val raw = ctx.freshName("raw")
      s"""
         |long $raw = Double.doubleToLongBits($c);
         |${ev.value} = $raw ^ (($raw >> 63) & Long.MAX_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object NumericExpressions {
  /** [[OrderedDoubleBits]] over any numeric column (cast to double — the
    * cast may merge near-equal wide integers into one bit image, which
    * only coarsens bucketing, never reorders it). */
  def orderedBits(c: Column): Column =
    GraftColumnBridge.column(OrderedDoubleBits(
      GraftColumnBridge.expression(c.cast("double"))))
}
