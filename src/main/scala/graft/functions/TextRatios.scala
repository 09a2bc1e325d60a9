package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass expressions for the two token-ratio signals whose
  * Column trees were lambda-based (`filter(toks, …)` — higher-order
  * functions are CodegenFallback, so they broke the scan stage's
  * whole-stage-codegen span and paid an interpreted predicate per
  * token; the same bug class as [[DupNgramFrac]]).
  *
  * Semantics replicate the expression trees operation-for-operation
  * (same `UTF8String.trim`/`toLowerCase`, same Java-regex split, same
  * IEEE division of two exact small integers), so every consumer's
  * published value is bit-identical and the oracle SQL is unchanged.
  */
object TextRatios {

  /** The 16-word stopword list shared with
    * [[graft.operators.TextOps.EnglishStopwords]] — kept here (the
    * expression must not depend on the operator layer) and asserted
    * equal in ExpressionSpec.
    */
  val Stopwords: Set[String] =
    Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for", "with", "as", "at", "by")

  /** `#stopword tokens / max(#tokens, 1)` over
    * `split(lower(trim(text)), "\s+")`. */
  def stopwordRatio(str: UTF8String): Double = {
    val toks = str.trim().toLowerCase().toString.split("\\s+", -1)
    var stops = 0
    var i = 0
    while (i < toks.length) {
      if (Stopwords.contains(toks(i))) stops += 1
      i += 1
    }
    stops.toDouble / math.max(toks.length, 1).toDouble
  }

  /** `#tokens containing an ASCII letter / max(#tokens, 1)` over
    * `split(trim(text), "\s+")` (the tree's per-token
    * `rlike("[A-Za-z]")` is a find(), i.e. "contains"). */
  def alphaWordFrac(str: UTF8String): Double = {
    val toks = str.trim().toString.split("\\s+", -1)
    var alpha = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var j = 0
      var found = false
      while (j < t.length && !found) {
        val c = t.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) found = true
        j += 1
      }
      if (found) alpha += 1
      i += 1
    }
    alpha.toDouble / math.max(toks.length, 1).toDouble
  }
}

/** `graft_stopword_ratio(text)`: fraction of whitespace tokens that
  * are English stopwords, as a raw double (consumers own any
  * quantization).
  */
case class StopwordRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_stopword_ratio"

  override protected def nullSafeEval(s: Any): Any =
    TextRatios.stopwordRatio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextRatios.stopwordRatio($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_alpha_word_frac(text)`: fraction of whitespace tokens that
  * contain at least one ASCII letter, as a raw double.
  */
case class AlphaWordFrac(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_alpha_word_frac"

  override protected def nullSafeEval(s: Any): Any =
    TextRatios.alphaWordFrac(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextRatios.alphaWordFrac($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
