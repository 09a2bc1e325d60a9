package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Robust winnowing (SIGMOD 2003) contract tests: the fingerprint
  * guarantee, the density bound, and tie determinism.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("every shared substring of length >= w+k-1 yields a shared fingerprint") {
    // k=5, w=4: guarantee threshold is 8 normalized chars. The two
    // docs share a 40-char passage embedded in different surroundings.
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = docs(
      1L -> s"HEADER ALPHA $shared TRAILER ONE",
      2L -> s"completely different opening text $shared and a different ending"
    )
    val fp = Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4)
    val pairs = Dedup.winnowPairs(fp, "doc_id", maxDocsPerHash = 10).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("n_shared") >= 1, "shared passage produced no shared fingerprint")
  }

  test("disjoint documents share no fingerprints") {
    val df = docs(
      1L -> "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii",
      2L -> "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr"
    )
    val fp = Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4)
    assert(Dedup.winnowPairs(fp, "doc_id", maxDocsPerHash = 10).count() == 0)
  }

  test("fingerprint density is ~2/(w+1) of k-grams, never empty for long docs") {
    val text = (1 to 50).map(i => s"sentence number $i with some filler words").mkString(" ")
    val fp = Dedup.winnowFingerprints(docs(1L -> text), "doc_id", "text", 5, 4)
    val n = fp.count().toDouble
    val grams = text.toLowerCase.replaceAll("[^a-z0-9]", "").length - 4
    // expected density 2/(w+1) = 0.4; allow a wide band — the point is
    // "a small fraction, not zero and not all"
    assert(n > grams * 0.15 && n < grams * 0.7, s"selected $n of $grams k-gram hashes")
  }

  test("scalar winnowFpArray is value-identical to the window-aggregate operator") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 150).select("doc_id", "text")
    val scalar = d.select(col("doc_id"), explode(Dedup.winnowFpArray(col("text"), 5, 4)).as("fp"))
      .select(col("doc_id"), col("fp.fp_pos").as("fp_pos"), col("fp.fp_hash").as("fp_hash"))
    val agg = Dedup.winnowFingerprints(d, "doc_id", "text", 5, 4)
    assert(scalar.except(agg).count() == 0 && agg.except(scalar).count() == 0,
      "scalar and window-aggregate winnowing diverge")
  }

  test("short documents yield no fingerprints; selection is deterministic") {
    val df = docs(1L -> "ab c", 2L -> "repeat repeat repeat repeat")
    val fp = Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4)
    assert(fp.filter("doc_id = 1").count() == 0)
    // identical k-grams in one window tie on hash: rightmost wins,
    // and two runs select the identical (pos, hash) set
    val a = fp.filter("doc_id = 2").collect().map(r => (r.getInt(1), r.getLong(2))).sorted
    val b = Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4)
      .filter("doc_id = 2").collect().map(r => (r.getInt(1), r.getLong(2))).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }
}
