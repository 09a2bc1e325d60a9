package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `graft_rolling_hashes(str, k)`: the
  * 31-bit polynomial hash of EVERY character k-gram of a string, as
  * one `array<bigint>` — the O(n) replacement for the dedup family's
  * md5-per-shingle CPU floor (hashing n shingles costs n digest
  * initializations + hex round-trips there; here it is one integer
  * recurrence over the code points).
  *
  * Definition (integer-only, so any engine reproduces it exactly —
  * the d12 oracle folds the same arithmetic in SQL):
  * `h(pos) = (Σ_{i<k} cp(pos+i) · B^{k-1-i}) mod P` over UNICODE CODE
  * POINTS, B = 131, P = 2^31 − 1. Computed rolling:
  * `h(pos+1) = ((h(pos) − cp(pos)·B^{k-1}) · B + cp(pos+k)) mod P`.
  * Strings shorter than k emit ONE hash of the whole string
  * (mirroring `charShingles`' single truncated shingle); the output
  * has max(numCodePoints − k + 1, 1) entries, and an empty string
  * hashes to [0].
  *
  * 31-bit collisions conflate distinct shingles at ~n²/2³¹ per
  * document — noise far below MinHash's own 1/√H sketch error, which
  * is the only consumer (d12); exact-Jaccard paths (d06/d07) keep the
  * collision-free shingle strings.
  */
case class RollingHashes(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_hashes"

  override protected def nullSafeEval(s: Any, kv: Any): Any =
    RollingHashes.compute(s.asInstanceOf[UTF8String], kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.RollingHashes.compute($s, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RollingHashes {
  val B = 131L
  val P = 2147483647L // Mersenne prime 2^31 - 1, the shared h31 modulus

  /** Shared by interpreted eval and generated code (the codegen path
    * emits a call to this static method — one implementation, no
    * interpreted-expression overhead inside whole-stage codegen).
    */
  def compute(str: UTF8String, k: Int): ArrayData = {
    val s = str.toString
    val n = Character.codePointCount(s, 0, s.length)
    if (k < 1) throw new IllegalArgumentException(s"graft_rolling_hashes: k must be >= 1, got $k")
    // code points up front: rolling needs cp(pos) again when the
    // window leaves it, and UTF-16 indexing is not constant-time in
    // code points
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (ci < n) {
      val cp = s.codePointAt(off)
      cps(ci) = cp
      off += Character.charCount(cp)
      ci += 1
    }
    if (n <= k) {
      // single (possibly truncated) gram — mirror charShingles
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + cps(i)) % P; i += 1 }
      return ArrayData.toArrayData(Array(h))
    }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % P; i += 1 }
    out(0) = h
    // bk1 = B^(k-1) mod P
    var bk1 = 1L
    i = 0
    while (i < k - 1) { bk1 = (bk1 * B) % P; i += 1 }
    var pos = 0
    while (pos < n - k) {
      var t = h - (cps(pos) * bk1) % P
      if (t < 0) t += P
      h = (t * B + cps(pos + k)) % P
      out(pos + 1) = h
      pos += 1
    }
    ArrayData.toArrayData(out)
  }
}
