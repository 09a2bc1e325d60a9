package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** ExactSubstr duplicated-span contract tests: span location and
  * merging, zero rows for unique docs, truncated-gram short docs, and
  * independence from bloom sizing (the exact-recount guarantee).
  */
class DupSpanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def run(k: Int, bitsPerKey: Int, rows: (Long, String)*) = {
    import spark.implicits._
    Dedup.dupSpans(rows.toDF("doc_id", "text"), "doc_id", "text", k, bitsPerKey)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
  }

  test("a shared passage is found and merges into one span; unique docs report zero") {
    // 30-char shared passage, k=10: 21 duplicated grams per doc,
    // overlapping -> ONE merged span covering exactly the passage
    val shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123" // 30 chars
    val out = run(10, 10,
      1L -> s"xxxx${shared}yyyyyyyy",
      2L -> s"zzzzzzzzzzzz${shared}qq",
      3L -> "completely unrelated content here")
    assert(out(1L) == ((21L, 1L, 30L, 0.714286))) // round(30/42, 6)
    assert(out(2L)._3 == 30L && out(2L)._2 == 1L)
    assert(out(3L) == ((0L, 0L, 0L, 0.0)))
  }

  test("two disjoint shared passages stay two spans; adjacent occurrences merge") {
    val p1 = "FIRSTSHAREDPASSAGE01" // 20 chars
    val p2 = "SECONDSHAREDBLOCK002" // 20 chars
    val out = run(10, 10,
      1L -> s"${p1}----------------${p2}",
      2L -> s"${p2}================${p1}")
    assert(out(1L)._2 == 2L, s"expected 2 merged spans, got ${out(1L)}")
    assert(out(1L)._3 == 40L)
    assert(out(2L)._2 == 2L && out(2L)._3 == 40L)
  }

  test("identical short docs (shorter than k) count as one truncated gram") {
    val out = run(15, 10, 1L -> "tiny", 2L -> "tiny", 3L -> "other")
    assert(out(1L) == ((1L, 1L, 4L, 1.0)))
    assert(out(2L) == ((1L, 1L, 4L, 1.0)))
    assert(out(3L) == ((0L, 0L, 0L, 0.0)))
  }

  test("result is independent of bloom sizing (hostile 1 bit/key)") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "a different sentence with the quick brown fox jumps inside it",
      3L -> "nothing in common with anything else whatsoever here")
    val a = run(12, 10, docs: _*)
    val b = run(12, 1, docs: _*)
    assert(a == b)
    assert(a(1L)._1 > 0 && a(3L) == ((0L, 0L, 0L, 0.0)))
  }

  test("whole-document duplicates cover the full length") {
    val text = "exactly the same document content in both places"
    val out = run(10, 10, 1L -> text, 2L -> text)
    assert(out(1L)._3 == text.length.toLong)
    assert(out(1L)._4 == 1.0)
    assert(out(1L)._2 == 1L)
  }
}
