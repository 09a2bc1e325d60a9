package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE contract tests on the classic Sennrich (2016) histogram
  * {low:5, lower:2, newest:6, widest:3}: hand-computed merge order
  * (with lexicographic tie-breaks), the canonical lowest→[low,est</w>]
  * encoding, the distributed histogram+encode plumbing, and
  * partition independence.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private val hist = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("merge order matches the hand computation, ties lexicographic") {
    // round 1: (e,s)=(s,t)=(t,</w>)=9 tie -> (e,s) lexicographically
    // round 2: (es,t)=(t,</w>)=9 -> (es,t); round 3: (est,</w>)=9
    // round 4: (l,o)=(o,w)=7 tie -> (l,o); round 5: (lo,w)=7
    val m = Bpe.trainMerges(hist, 5)
    assert(m == Vector(
      ("e", "s", 9L), ("es", "t", 9L), ("est", Bpe.Eow, 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("training stops early when no pairs remain") {
    // single 1-char word: "a</w>" has one pair, then one symbol
    val m = Bpe.trainMerges(Seq("a" -> 3L), 10)
    assert(m == Vector(("a", Bpe.Eow, 3L)))
  }

  test("encodeWord reproduces the canonical lowest -> [low, est</w>]") {
    val merges = Bpe.trainMerges(hist, 5).map { case (l, r, _) => (l, r) }
    assert(Bpe.encodeWord("lowest", merges) == Vector("low", "est" + Bpe.Eow))
    assert(Bpe.encodeWord("low", merges) == Vector("low", Bpe.Eow))
    // fully OOV characters stay as singleton symbols
    assert(Bpe.encodeWord("xyz", merges) == Vector("x", "y", "z", Bpe.Eow))
  }

  test("overlapping pairs merge leftmost-first") {
    // "aaa" with the single merge (a,a): [aa, a, </w>]
    assert(Bpe.encodeWord("aaa", Seq(("a", "a"))) == Vector("aa", "a", Bpe.Eow))
  }

  test("distributed histogram + encodeStats match the scalar path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest lowest")
    ).toDF("doc_id", "text")

    val h = Bpe.wordHistogram(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L, "lowest" -> 1L))

    val mergeList = Bpe.trainMerges(h.toSeq, 5).map { case (l, r, _) => (l, r) }
    val stats = Bpe.encodeStats(docs, "doc_id", "text", mergeList).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest lowest")
    ).map { case (id, text) =>
      val ws = text.split(" ")
      id -> ((ws.length.toLong, ws.map(w => Bpe.encodeWord(w, mergeList).length.toLong).sum))
    }.toMap
    assert(stats == expected)
  }

  test("merge table is partition-independent") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"low lower newest widest tok$i")).toDF("doc_id", "text")
    val a = Bpe.merges(spark, docs, "text", 10).collect().toSeq.map(_.toSeq)
    val b = Bpe.merges(spark, docs.repartition(7), "text", 10).collect().toSeq.map(_.toSeq)
    assert(a == b)
  }

  test("d33's rank-1 pair is the trainer's first merge selection") {
    val dir = "/root/testdata/sf0.001"
    val top = SparkEntry.queries("d33_bpe_pairs")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rk") === 1).collect()
    assert(top.length == 1)
    val first = Bpe.trainFromCorpus(
      graft.sources.Tables.documents(spark, dir), "text", 1).head
    assert((top(0).getString(1), top(0).getString(2), top(0).getLong(3)) ==
      ((first._1, first._2, first._3)),
      "relational pair argmax diverged from the merge loop's selection")
  }
}
