package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `graft_dup_ngram_frac(text, n)`: the
  * duplicate word-n-gram fraction `1 − distinct/total` over a
  * document's whitespace n-grams, in ONE pass (split + hash set).
  *
  * This replaces the higher-order-function tree
  * (`transform`/`slice`/`concat_ws`/`array_distinct`) that computed
  * the same value: lambda expressions are CodegenFallback, so that
  * tree broke the scan stage's whole-stage-codegen span and paid an
  * interpreted array allocation per gram — measured ~0.5 ms/doc at
  * sf0.1, the single largest cost in the c01/d21 rule path. The
  * semantics are replicated operation-for-operation so the value is
  * bit-identical (and the oracle SQL unchanged):
  *
  *  - words  = `trim(text)` (0x20-trim, as Spark's `trim`) split by
  *    the Java regex `\s+` with limit −1 (as Spark's `split`);
  *  - G      = max(#words − (n−1), 1) grams; gram i joins words
  *    [i, min(i+n, #words)) with a single space (`concat_ws`
  *    semantics — a short document contributes one whole-text gram);
  *  - result = 1 − |distinct grams| / G, an IEEE division of two
  *    small exact integers (the caller applies the portable product
  *    quantizer, unchanged).
  *
  * Returns a raw double so the existing `round(x·1e6)/1e6` wrapper in
  * [[graft.operators.TextOps.dupNgramFrac]] stays the single place
  * that defines the published quantization.
  */
case class DupNgramFrac(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dup_ngram_frac"

  override protected def nullSafeEval(s: Any, nv: Any): Any =
    DupNgramFrac.compute(s.asInstanceOf[UTF8String], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"graft.functions.DupNgramFrac.compute($s, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DupNgramFrac {

  /** Shared by interpreted eval and generated code. */
  def compute(str: UTF8String, n: Int): Double = {
    if (n < 1) throw new IllegalArgumentException(s"graft_dup_ngram_frac: n must be >= 1, got $n")
    // trim() is Spark's 0x20-only trim; String.split(regex, -1) is
    // exactly StringSplit's semantics (same Pattern engine, trailing
    // empties kept) — a tab-led document keeps its leading "" word
    // here just as the expression tree did
    val words = str.trim().toString.split("\\s+", -1)
    val g = math.max(words.length - (n - 1), 1)
    val seen = new java.util.HashSet[String](g * 2)
    var distinct = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < g) {
      sb.setLength(0)
      val end = math.min(i + n, words.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    1.0 - distinct.toDouble / g.toDouble
  }
}
