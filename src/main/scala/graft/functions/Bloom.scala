package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native Catalyst expression `graft_bloom_contains(filter, hash)`:
  * membership probe of a 64-bit hash against a serialized graft bloom
  * filter (see [[Bloom]] for the layout and probe schedule). The
  * filter normally arrives as one `lit(bytes)` — a driver-built
  * sketch referenced (not inlined) by generated code — so the probe
  * runs inside whole-stage codegen with zero per-row allocation.
  *
  * Guarantee: NO false negatives (every inserted hash probes true),
  * tunable false-positive rate (~0.8% at 10 bits/key with 6 probes).
  * Callers that need an exact answer re-verify survivors with an
  * exact join — the filter's job is only to keep the big side's
  * non-members from ever reaching a shuffle.
  */
case class BloomContains(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(f: Any, h: Any): Any =
    Bloom.contains(f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, h) => s"graft.functions.Bloom.contains($f, $h)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Blocked-probe bloom filter over 64-bit hashes, built distributed
  * (one `treeAggregate` over the key hashes — the partial bit arrays
  * OR together, so the build is one pass with no shuffle of the
  * keys) and probed by the codegen'd [[BloomContains]] expression.
  *
  * Serialized layout: `byte 0 = k` (probe count), bytes 1.. = the bit
  * array, LSB-first within each byte. Probe schedule is double
  * hashing `pos_i = (h + i·h2) mod nBits` with `h2 = fmix64(h) | 1`
  * (odd, so the probe stride never degenerates); everything is
  * integer arithmetic on the caller-supplied hash — deterministic
  * across partitionings, restarts, and engines.
  *
  * Scale shape: the filter is ~`bitsPerKey/8` bytes per distinct key
  * (10 bits/key ⇒ 1.25 GB per 10⁹ keys) — an order of magnitude under
  * the exact key set a broadcast semi-join would ship, which is the
  * point: it extends the "small side broadcasts, big side never
  * shuffles" plan past the scale where the exact set outgrows the
  * broadcast envelope.
  */
object Bloom {

  /** Murmur3 fmix64 — the standard 64-bit avalanche finalizer. */
  def mix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Probe: true iff all k positions for `hash` are set. Called from
    * both interpreted eval and generated code (single implementation).
    */
  def contains(filter: Array[Byte], hash: Long): Boolean = {
    val k = filter(0) & 0xff
    val nBits = (filter.length - 1).toLong * 8L
    val h2 = mix(hash) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(hash + i.toLong * h2, nBits)
      if (((filter(1 + (pos >>> 3).toInt) >>> (pos & 7L).toInt) & 1) == 0) return false
      i += 1
    }
    true
  }

  private def setBits(bits: Array[Byte], hash: Long, k: Int): Unit = {
    val nBits = bits.length.toLong * 8L
    val h2 = mix(hash) | 1L
    var i = 0
    while (i < k) {
      // builder array carries no header byte; `build` prepends it
      val pos = java.lang.Math.floorMod(hash + i.toLong * h2, nBits)
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Build a filter from one LONG hash column (nulls dropped): one
    * distributed pass, partial bit arrays OR-merged up a tree. Sizing
    * is the caller's: `numBits ≈ distinctKeys × bitsPerKey` with
    * `k ≈ 0.7 × bitsPerKey` probes (k=6..7 at 10 bits/key ⇒ <1% FPR).
    */
  def build(hashes: DataFrame, hashCol: Column, numBits: Long, k: Int): Array[Byte] = {
    require(k >= 1 && k <= 255, s"bloom probe count out of range: $k")
    val nBytes = math.max(1L, (numBits + 7L) / 8L)
    require(nBytes <= Int.MaxValue - 8, s"bloom filter too large: $nBytes bytes")
    val rdd = hashes.select(hashCol.cast("long").as("h")).na.drop()
      .rdd.map(_.getLong(0))
    val bits = rdd.treeAggregate(new Array[Byte](nBytes.toInt))(
      seqOp = (arr, h) => { setBits(arr, h, k); arr },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
        a
      })
    val out = new Array[Byte](bits.length + 1)
    out(0) = k.toByte
    System.arraycopy(bits, 0, out, 1, bits.length)
    out
  }

  /** Column form of the probe: `contains(filterBytes, hash)`.
    * Self-registering on the active session (`GraftFunctions.ensure`).
    */
  def containsCol(filter: Array[Byte], hash: Column): Column = {
    GraftFunctions.ensure()
    call_function("graft_bloom_contains", lit(filter), hash)
  }
}
