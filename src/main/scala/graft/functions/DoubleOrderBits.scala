package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: map a double to an order-preserving
  * signed long — `b = doubleToLongBits(x); b >= 0 ? b : b ^
  * 0x7fffffffffffffffL` (the classic IEEE-754 total-order transform:
  * positives keep their bit pattern, negatives get their magnitude
  * bits flipped so more-negative doubles map to more-negative longs).
  *
  * `x < y  ⇒  orderBits(x) < orderBits(y)` under Spark SQL's double
  * ordering (NaN canonicalized by doubleToLongBits and mapped largest,
  * -0.0 maps to -1 just below +0.0's 0), so any PREFIX of the long
  * (e.g. `shiftright(ob, 44)`) is a monotone histogram bin — the
  * primitive [[graft.operators.Percentiles.exactByHistogram]] builds
  * its two-pass exact-percentile selection on.
  */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_order_bits"

  override protected def nullSafeEval(x: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])
    if (b >= 0L) b else b ^ 0x7fffffffffffffffL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"""(Double.doubleToLongBits($x) >= 0L
         |  ? Double.doubleToLongBits($x)
         |  : Double.doubleToLongBits($x) ^ 0x7fffffffffffffffL)""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
