package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Identity wrapper over a boolean expression that is OPAQUE to
  * pattern-matching optimizer rules — evaluation and codegen delegate
  * straight to the child, but `lowerOf`/`upperOf`-style comparison
  * matchers (and Catalyst's own boolean normalizations, which only
  * fire on known node types) cannot see through it.
  *
  * Why it exists: [[IntervalJoinRule]]'s naive-fallback branch (wide
  * intervals past the explode cap) keeps the ORIGINAL band condition
  * in its join. Under a fixed-point optimizer batch (the
  * `GraftExtensions.injectOptimizerRule` deploy path) that branch
  * would re-match the rule on the next iteration and split again —
  * forever (bounded only by maxIterations, each round stacking
  * another Generate). Wrapping the two band bounds in a barrier makes
  * the rewrite convergent BY CONSTRUCTION: the matcher sees two
  * non-comparison conjuncts and bails. [[graft.operators.IntervalJoin]]'s
  * own naive branch uses it for the same reason — a session-default
  * rule must not re-explode the operator's deliberate fallback.
  *
  * Deterministic, null-transparent, codegen'd (zero-cost: the
  * generated code IS the child's). Registered as `graft_barrier` for
  * DataFrame/SQL use.
  */
case class PredicateBarrier(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
