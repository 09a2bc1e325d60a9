package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DeflateRatio
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio signal contract tests: the ordering that makes
  * it a usable repetition detector (repetitive << prose < random),
  * edge cases, and codegen/eval agreement.
  */
class DeflateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private val repetitive = "spam spam spam " * 200
  private val prose = "The measurement campaign covered three years of one-minute " +
    "power data from a mid-size photovoltaic fleet, with maintenance logs and " +
    "inverter fault codes joined per site to separate hardware loss from soiling."
  // pseudo-random printable text (deterministic): md5-chain bytes
  // mapped onto the full 94-symbol printable range (~6.6 bits/char —
  // hex output would be only 4 bits/char and compress BETTER than
  // prose, inverting the ordering this signal relies on)
  private val random = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to 80).flatMap { i =>
      md.digest(s"seed$i".getBytes("UTF-8")).map(b => (33 + java.lang.Math.floorMod(b, 94)).toChar)
    }.mkString
  }

  test("ratio orders repetitive << prose < near-random") {
    val r = DeflateRatio.compute(UTF8String.fromString(repetitive))
    val p = DeflateRatio.compute(UTF8String.fromString(prose))
    val x = DeflateRatio.compute(UTF8String.fromString(random))
    assert(r < 0.1, s"repetitive ratio $r")
    assert(p > 0.3 && p < 1.0, s"prose ratio $p")
    assert(x > p, s"random ($x) should compress worse than prose ($p)")
    assert(r < p, s"repetitive ($r) should compress better than prose ($p)")
  }

  test("empty string reports 1.0; null propagates") {
    import spark.implicits._
    assert(DeflateRatio.compute(UTF8String.fromString("")) == 1.0)
    val out = Seq((1L, Option("abc abc abc abc abc")), (2L, Option("")), (3L, None))
      .toDF("id", "t")
      .select($"id", call_function("graft_deflate_ratio", $"t").as("r"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(2L) == 1.0)
    assert(out(3L) == null)
  }

  test("expression (codegen path) equals direct compute") {
    import spark.implicits._
    val texts = Seq(repetitive, prose, random, "x", "tiny bit of text")
    val viaExpr = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", call_function("graft_deflate_ratio", $"t").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(viaExpr(i.toLong) == DeflateRatio.compute(UTF8String.fromString(t)),
        s"codegen/eval mismatch on text $i")
    }
  }

  test("d20 query shape: invariant gate columns hold on documents, no shuffle") {
    val df = SparkEntry.queries("d20_compress_ratio")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the oracle asserts these as literal trues — they must be
    // construction-true Spark-side on every row
    Seq("ratio_pos", "ratio_bounded", "double_compresses").foreach { c =>
      val i = df.columns.indexOf(c)
      assert(rows.forall(_.getBoolean(i)), s"$c violated")
    }
    // the codec pins the oracle freezes (level-6 raw deflate)
    assert(rows.head.getDouble(df.columns.indexOf("pin_rep")) == 0.0097)
    assert(rows.head.getDouble(df.columns.indexOf("pin_mix")) == 0.8445)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"d20 should be a pure map:\n$plan")
  }
}
