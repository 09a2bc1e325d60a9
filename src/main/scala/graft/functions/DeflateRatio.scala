package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `graft_deflate_ratio(str)`: DEFLATE
  * compressed size over raw UTF-8 size — the compression-ratio
  * quality signal corpus pipelines use as a cheap repetition /
  * boilerplate detector (highly repetitive text compresses far below
  * ~0.4; natural prose sits around 0.5–0.7; random or already-
  * compressed content near or above 1.0).
  *
  * Pure map at any scale: no shuffle, no state, one thread-local
  * Deflater reused across rows (zlib level 6, raw stream — no
  * header/checksum variance in the count). Deterministic for a given
  * JVM zlib; NOT reproducible in a SQL engine, so its gate check is
  * rows-only and its value contracts live in `DeflateSpec`.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(s: Any): Any =
    DeflateRatio.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.DeflateRatio.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {

  private val localDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }
  private val localScratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Compressed/raw byte ratio; empty input reports 1.0. */
  def compute(str: UTF8String): Double = {
    val bytes = str.getBytes
    if (bytes.length == 0) return 1.0
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val scratch = localScratch.get()
    var out = 0L
    while (!d.finished()) out += d.deflate(scratch)
    out.toDouble / bytes.length.toDouble
  }
}
