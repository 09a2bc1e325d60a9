package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Line-level boilerplate removal (`Dedup.lineBoilerplate` — the
  * CCNet/Dolma crawl-cleaning idiom): frequency semantics
  * (distinct-document counts, within-doc repeats once), exact removal
  * and reassembly, delimiter generality, and the bloom tier's
  * no-false-negative contract past the exact-broadcast envelope.
  */
class LineBoilerplateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  /** 20 docs: a shared header in all, a footer in 10, one unique line
    * each; doc 0 repeats the header INSIDE itself (counts once).
    */
  private def corpus: DataFrame =
    (0 until 20).map { i =>
      val header = "SITE NAVIGATION MENU"
      val footer = "all rights reserved"
      val unique = s"unique content line $i"
      val body =
        if (i == 0) Seq(header, unique, header) // in-doc repeat
        else if (i < 10) Seq(header, unique)
        else Seq(header, unique, footer)
      (i.toLong, body.mkString("\n"))
    }.toDF("id", "text")

  test("lines above the distinct-doc threshold are stripped; unique lines survive verbatim") {
    val out = Dedup.lineBoilerplate(corpus, "id", "text", minDocs = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 20)
    (0 until 20).foreach { i =>
      val (clean, nLines, nRemoved) = out(i.toLong)
      assert(clean == s"unique content line $i", s"doc $i cleaned to '$clean'")
      val expLines = if (i == 0) 3 else if (i < 10) 2 else 3
      assert(nLines == expLines && nRemoved == expLines - 1,
        s"doc $i: n_lines=$nLines n_removed=$nRemoved")
    }
  }

  test("within-doc repeats count one document: a line in 4 docs (one repeating it) stays") {
    // the header appears 3 times across 2 docs → distinct docs = 2 < 3
    val df = Seq(
      (1L, "dup\ndup\nbody one"),
      (2L, "dup\nbody two"),
      (3L, "body three")
    ).toDF("id", "text")
    val out = Dedup.lineBoilerplate(df, "id", "text", minDocs = 3)
      .orderBy("id").collect()
    assert(out.forall(_.getLong(3) == 0), "nothing crosses a distinct-doc threshold of 3")
    assert(out(0).getString(1) == "dup\ndup\nbody one", "text must pass through unchanged")
  }

  test("custom delimiter (paragraph grain) and regex-metacharacter delimiters are literal") {
    val df = Seq(
      (1L, "common para|my para 1"),
      (2L, "common para|my para 2"),
      (3L, "common para|my para 3")
    ).toDF("id", "text")
    val out = Dedup.lineBoilerplate(df, "id", "text", minDocs = 3, delimiter = "|")
      .orderBy("id").collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(1) == s"my para ${i + 1}", s"got '${r.getString(1)}'")
      assert(r.getLong(3) == 1)
    }
  }

  test("bloom tier past the envelope: every boilerplate line still removed (no false negatives)") {
    val out = Dedup.lineBoilerplate(corpus, "id", "text", minDocs = 5,
      maxExactLines = 0) // force the bloom route
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // no false negatives: the header/footer are gone from every doc
    out.values.foreach { clean =>
      assert(!clean.contains("SITE NAVIGATION MENU") && !clean.contains("all rights reserved"),
        s"boilerplate survived the bloom tier: '$clean'")
    }
    // unique lines may only disappear at the bloom FPR — with 2
    // boilerplate lines and 10 bits/key the FPR is ~1e-2 per probe;
    // 20 unique lines must not ALL vanish (a sign the filter matched
    // everything)
    assert(out.values.count(_.nonEmpty) >= 18,
      s"bloom tier dropped too many unique lines: ${out.values.count(_.isEmpty)} empty docs")
  }

  test("degenerate input: empty corpus and empty text") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Dedup.lineBoilerplate(empty, "id", "text", minDocs = 2).count() == 0)
    val blank = Seq((1L, ""), (2L, ""), (3L, "x")).toDF("id", "text")
    val out = Dedup.lineBoilerplate(blank, "id", "text", minDocs = 2)
      .orderBy("id").collect()
    // the empty line appears in 2 docs -> boilerplate; doc 3 keeps "x"
    assert(out(0).getString(1) == "" && out(0).getLong(3) == 1)
    assert(out(2).getString(1) == "x" && out(2).getLong(3) == 0)
  }

  test("intra-doc dedup keeps first occurrences in order; zero shuffles in the plan") {
    val df = Seq(
      (1L, "nav\nbody a\nnav\nbody b\nnav"),
      (2L, "x\nx\nx"),
      (3L, "unique only")
    ).toDF("id", "text")
    val out = Dedup.dedupLinesWithinDoc(df, "id", "text").orderBy("id").collect()
    assert(out(0).getString(1) == "nav\nbody a\nbody b" && out(0).getLong(3) == 2)
    assert(out(1).getString(1) == "x" && out(1).getLong(3) == 2)
    assert(out(2).getString(1) == "unique only" && out(2).getLong(3) == 0)
    val plan = Dedup.dedupLinesWithinDoc(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"intra-doc dedup must be shuffle-free:\n$plan")
  }
}
