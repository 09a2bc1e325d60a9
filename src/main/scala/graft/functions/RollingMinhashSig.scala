package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression
  * `graft_rolling_minhash_sig(text, k, numHashes)` → `array<bigint>`:
  * the complete rolling-hash MinHash signature (every character
  * k-gram's 31-bit polynomial hash → per-hash-index universal-hash
  * min-fold) as one tight JVM loop.
  *
  * Replaces the `array_distinct` + per-index `aggregate` min-fold
  * composition in `Dedup.rollingMinhashSig`: `aggregate` is a lambda
  * HOF (CodegenFallback), so the fold ran numHashes × |grams|
  * interpreted steps per document (~19k for a 300-char doc at 64
  * hashes — the d12 gate's measured CPU floor).
  *
  * Value-identical to the composition by construction:
  *  - the gram hashes are [[RollingHashes.compute]] itself (shared
  *    code, same B=131 / P=2³¹−1 recurrence, same short-string and
  *    empty-string edges);
  *  - the `array_distinct` step is dropped because a min-fold is
  *    duplicate-insensitive — min over the multiset equals min over
  *    the set;
  *  - the hash family is `Dedup.universalHash`'s exact integer
  *    arithmetic: `a_j = (1103515245·(j+1)) mod P`,
  *    `b_j = (69069·(j+1) + 12345) mod P`, `(a_j·h + b_j) mod P`
  *    (all sub-2⁶³ intermediates — no overflow);
  *  - an absent gram set folds to Long.MaxValue, exactly as the
  *    `aggregate` initial value did (unreachable in practice:
  *    `graft_rolling_hashes` emits ≥ 1 hash for every string).
  *
  * ExpressionSpec pins native ≡ composition bit-for-bit.
  */
case class RollingMinhashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_minhash_sig"

  override protected def nullSafeEval(t: Any, kv: Any, nh: Any): Any =
    RollingMinhashSig.compute(
      t.asInstanceOf[UTF8String], kv.asInstanceOf[Int], nh.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, nh) =>
      s"graft.functions.RollingMinhashSig.compute($t, $k, $nh)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RollingMinhashSig {
  private val P = RollingHashes.P

  /** Shared by interpreted eval and generated code. */
  def compute(str: UTF8String, k: Int, numHashes: Int): ArrayData = {
    if (numHashes < 1)
      throw new IllegalArgumentException(
        s"graft_rolling_minhash_sig: numHashes must be >= 1, got $numHashes")
    val grams = RollingHashes.compute(str, k)
    val n = grams.numElements()
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      as(j) = (1103515245L * (j + 1)) % P
      bs(j) = (69069L * (j + 1) + 12345L) % P
      j += 1
    }
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = grams.getLong(i)
      j = 0
      while (j < numHashes) {
        val v = (as(j) * h + bs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
