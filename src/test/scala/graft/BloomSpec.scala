package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom
import graft.operators.{Dedup, TextOps}

/** Bloom filter contract tests: the no-false-negative guarantee, a
  * sane false-positive rate at the default sizing, codegen/eval
  * agreement through the registered SQL function, and — the consumer
  * contract — `deltaDedupBloom` returning verdicts identical to the
  * exact-broadcast `deltaDedup` plan.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  test("no false negatives: every inserted hash probes true") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 2654435761L + 17L)
    val df = keys.toDF("h")
    val bloom = Bloom.build(df, col("h"), keys.size * 10L, 6)
    val misses = df.filter(!Bloom.containsCol(bloom, col("h"))).count()
    assert(misses == 0L, s"$misses inserted keys probed false")
  }

  test("false-positive rate at 10 bits/key, 6 probes is under 5%") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 2654435761L + 17L)
    val bloom = Bloom.build(keys.toDF("h"), col("h"), keys.size * 10L, 6)
    // disjoint probe set (different affine family)
    val probes = (0L until 20000L).map(i => i * 1099511628211L + 3L)
    val fp = probes.toDF("h").filter(Bloom.containsCol(bloom, col("h"))).count()
    val rate = fp.toDouble / probes.size
    assert(rate < 0.05, s"false-positive rate $rate")
  }

  test("interpreted eval equals the codegen'd probe") {
    import spark.implicits._
    val keys = (0L until 500L).map(i => Bloom.mix(i))
    val bloom = Bloom.build(keys.toDF("h"), col("h"), keys.size * 10L, 6)
    val probes = (-2000L until 2000L).toDF("h")
    val viaExpr = probes.withColumn("c", Bloom.containsCol(bloom, col("h")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.collect().foreach { r =>
      val h = r.getLong(0)
      assert(viaExpr(h) == Bloom.contains(bloom, h), s"mismatch at $h")
    }
  }

  test("deltaDedupBloom verdicts are identical to exact deltaDedup") {
    import spark.implicits._
    // synthetic corpus: ids 0-49 existing, 50-99 delta; some delta
    // docs repeat corpus content, some repeat each other, some fresh
    val mk = (i: Long) => i match {
      case i if i >= 50 && i % 7 == 0 => s"corpus text ${i % 10}" // dup of corpus
      case i if i >= 50 && i % 5 == 0 => "shared delta passage"   // dup in delta
      case i if i < 50                => s"corpus text ${i % 10}"
      case i                          => s"fresh text $i"
    }
    val docs = (0L until 100L).map(i => (i, mk(i))).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" < 50)
    val delta = docs.filter($"doc_id" >= 50)
    val exact = Dedup.deltaDedup(corpus, delta, "doc_id", "text", TextOps.fingerprint)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val bloom = Dedup.deltaDedupBloom(corpus, delta, "doc_id", "text", TextOps.fingerprint)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(bloom == exact)
    assert(exact.values.toSet == Set("dup_of_corpus", "dup_in_delta", "kept"),
      "fixture should exercise all three verdicts")
  }

  test("deltaDedup auto-routes to the bloom plan past the exact-broadcast envelope, verdicts unchanged") {
    import spark.implicits._
    val mk = (i: Long) => i match {
      case i if i >= 50 && i % 7 == 0 => s"corpus text ${i % 10}"
      case i if i >= 50 && i % 5 == 0 => "shared delta passage"
      case i if i < 50                => s"corpus text ${i % 10}"
      case i                          => s"fresh text $i"
    }
    val docs = (0L until 100L).map(i => (i, mk(i))).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" < 50)
    val delta = docs.filter($"doc_id" >= 50)
    val exact = Dedup.deltaDedup(corpus, delta, "doc_id", "text", TextOps.fingerprint)
    // maxExactKeys = 1 forces the switch: every verdict must survive it
    val routed = Dedup.deltaDedup(corpus, delta, "doc_id", "text", TextOps.fingerprint,
      maxExactKeys = 1L)
    // analyzed (pre-optimization) plans: on LocalRelation fixtures the
    // optimizer constant-folds the whole probe away, so the optimized
    // plan can't witness the routing decision
    assert(!exact.queryExecution.analyzed.toString.contains("graft_bloom_contains"),
      "small delta should keep the exact broadcast plan")
    assert(routed.queryExecution.analyzed.toString.contains("graft_bloom_contains"),
      "forced switch should plan the bloom probe")
    val em = exact.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val rm = routed.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(rm == em, "switch point changed verdicts")
    assert(em.values.toSet == Set("dup_of_corpus", "dup_in_delta", "kept"))
  }

  test("deltaDedupBloom survives a hostile 1-bit-per-key sizing (FPs killed exactly)") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, if (i % 9 == 0) "dup content" else s"text $i"))
      .toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" < 50)
    val delta = docs.filter($"doc_id" >= 50)
    val exact = Dedup.deltaDedup(corpus, delta, "doc_id", "text", TextOps.fingerprint)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val tiny = Dedup.deltaDedupBloom(corpus, delta, "doc_id", "text", TextOps.fingerprint,
      bitsPerKey = 1, numProbes = 1)
    assert(tiny.collect().map(r => (r.getLong(0), r.getString(2))).toMap == exact)
  }
}
