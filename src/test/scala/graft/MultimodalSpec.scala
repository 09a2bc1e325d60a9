package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal blob operators: the dedup census and chunk-level
  * shared-content contracts (m04/m05 carry the cross-engine value
  * gates; these pin the invariants the gates cannot express).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private def blobs = Multimodal.withBlob(
    Tables.documents(spark, "/root/testdata/sf0.001"), "text")

  test("exact blob census is total: group sizes sum to the corpus, keepers are members") {
    val census = Multimodal.exactBlobGroups(blobs, "doc_id", minGroupSize = 1).cache()
    val nDocs = blobs.count()
    assert(census.agg(sum(col("n_blobs"))).collect()(0).getLong(0) == nDocs,
      "every blob must land in exactly one digest group")
    // the keeper really carries the group's digest
    val byDoc = blobs.select(col("doc_id").as("keeper_id"), md5(col("blob")).as("d2"))
    val bad = census.join(byDoc, Seq("keeper_id")).filter(col("digest") =!= col("d2")).count()
    assert(bad == 0, "keeper_id must be a member of its digest group")
    assert(census.filter(col("is_dup") =!= (col("n_blobs") >= 2)).count() == 0)
    census.unpersist()
  }

  test("dup groups only: synthetic corpus with byte-exact copies") {
    val df = Multimodal.withBlob(Seq(
      (1L, "same payload"), (2L, "same payload"), (3L, "unique"),
      (4L, "same payload"), (5L, "other dup"), (6L, "other dup")
    ).toDF("doc_id", "text"), "text")
    val groups = Multimodal.exactBlobGroups(df, "doc_id")
      .collect().map(r => (r.getAs[Long]("keeper_id"), r.getAs[Long]("n_blobs"))).toMap
    assert(groups == Map(1L -> 3L, 5L -> 2L), s"got $groups")
  }

  test("chunk shared pairs: ordered ids, containment bounds, self-containment = 1 for a byte copy") {
    val df = Multimodal.withBlob(Seq(
      (1L, "A" * 200 + "B" * 56),   // 4 chunks
      (2L, "A" * 200 + "B" * 56),   // byte copy of 1 → containment 1.0
      (3L, "A" * 200 + "C" * 56),   // shares the three all-A chunks
      (4L, "Z" * 256)               // shares nothing
    ).toDF("doc_id", "text"), "text")
    val pairs = Multimodal.chunkSharedPairs(df, "doc_id", 64, 50, 0.5)
      .collect().map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        r.getAs[Double]("containment"))).toMap
    assert(pairs.keySet.forall { case (a, b) => a < b })
    assert(pairs((1L, 2L)) == 1.0, "byte copy must have containment 1")
    // docs 1/3 and 2/3: 200 A's chunk to [A*64, A*64, A*64, tail]; the
    // 4th chunk differs → 3 shared of min(4, 4)... but the DISTINCT
    // digests per doc are 2 (A-chunk, tail), of which 1 is shared and
    // under the ≥2-df postings rule the A-chunk survives: 1/2 = 0.5
    assert(pairs((1L, 3L)) == 0.5 && pairs((2L, 3L)) == 0.5, s"got $pairs")
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L },
      "doc 4 shares nothing and must not pair")
    assert(pairs.values.forall(c => c >= 0.5 && c <= 1.0))
  }

  test("gate convention guard: corpus text is ASCII (byte chunks == char chunks)") {
    // the m02/m05 oracles slice DuckDB VARCHARs by CHARACTER while the
    // Spark side slices the blob by BYTE — equal only while the corpus
    // is ASCII. If the testdata generator ever emits multi-byte text,
    // fail HERE with a named cause instead of as a bare hash mismatch.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val nonAscii = Tables.documents(spark, dir)
        .filter(length(col("text")) =!= octet_length(col("text"))).count()
      assert(nonAscii == 0,
        s"$dir has $nonAscii non-ASCII documents — m02/m05's byte-vs-char chunk convention breaks")
    }
  }

  test("boilerplate cap drops a chunk shared by too many blobs before the pair join") {
    // 12 docs all sharing one boilerplate chunk + a unique chunk:
    // with the cap at 10, the shared chunk's postings list is dropped
    // and no pairs remain
    val df = Multimodal.withBlob(
      (1L to 12L).map(i => (i, "H" * 64 + s"unique content for doc $i" + "x" * 30))
        .toDF("doc_id", "text"), "text")
    assert(Multimodal.chunkSharedPairs(df, "doc_id", 64, 10, 0.1).count() == 0)
    // raising the cap re-admits it
    assert(Multimodal.chunkSharedPairs(df, "doc_id", 64, 50, 0.1).count() == 66)
  }
}
