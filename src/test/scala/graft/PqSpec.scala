package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** Product-quantization contract tests: code range and compression,
  * reconstruction error shrinking with codebook size, ADC recall
  * against the exact L2 ranking, and partition-independence of the
  * encoding.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  val dir = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, dir)

  test("codes are in range and one per subspace") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    assert(books.length == 4 && books.forall(_.length == 8))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4)
      assert(cs.forall(c => c >= 0 && c < 8), s"code out of range: $cs")
    }
  }

  test("ADC serving refuses a query set past the driver-state ceiling") {
    // the serving envelope in code (VERDICT r9 #7): the query side
    // COLLECTS (LUT built on the driver, broadcast at |q|·m·k doubles),
    // so an unbounded query table must fail loudly with the chunked
    // route named, never OOM the driver
    import spark.implicits._
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, k = 8, iters = 1)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val dim = books.length * books(0)(0).length
    val oversized = spark.range(Similarity.MaxQueryRows + 1)
      .select(col("id").as("vec_id"),
        array(Seq.fill(dim)(lit(0.0)): _*).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.pqAdcTopK(codes, books, oversized, "vec_id", "embedding", k = 1)
        .count()
    }
    assert(e.getMessage.contains("driver-state ceiling"), e.getMessage)
    assert(e.getMessage.contains("chunk"), "error must name the chunked route")
  }

  test("reconstruction error shrinks as the codebook grows") {
    import spark.implicits._
    val vecs = emb.select(col("embedding").cast("array<double>")).as[Seq[Double]].collect()
    def reconErr(k: Int): Double = {
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, k = k, iters = 2)
      val sub = books(0)(0).length
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
        .orderBy("vec_id").collect().map(_.getSeq[Int](1))
      vecs.zip(codes).map { case (v, cs) =>
        cs.zipWithIndex.map { case (c, s) =>
          val cw = books(s)(c)
          (0 until sub).map(t => math.pow(v(s * sub + t) - cw(t), 2)).sum
        }.sum
      }.sum / vecs.length
    }
    val e2 = reconErr(2)
    val e16 = reconErr(16)
    assert(e16 < e2 * 0.8, s"k=16 recon error $e16 not well below k=2's $e2")
  }

  test("ADC top-3 lands in the exact L2 near-neighborhood (rank contract)") {
    // the fixture embeddings are near-isotropic — exact d2 from a
    // query to its rank-1 vs rank-5 neighbor differs by only ~5%, so
    // top-3 set recall is noise by construction. The meaningful ADC
    // contract is RANK: the vectors ADC picks must sit deep in the
    // exact ordering's head (measured ~31 mean rank of 499; random
    // choice would average ~250).
    import spark.implicits._
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val queries = emb.filter(col("vec_id") < 8)
    val adc = Similarity.pqAdcTopK(codes, books, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val all = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val ranks = (0L until 8L).flatMap { qid =>
      val qv = all.find(_._1 == qid).get._2
      val ranked = all.filter(_._1 != qid)
        .map { case (nid, nv) => nid -> nv.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum }
        .sortBy { case (nid, d) => (d, nid) }.map(_._1).zipWithIndex.toMap
      adc(qid).map(n => ranked(n) + 1)
    }
    val meanRank = ranks.sum.toDouble / ranks.length
    assert(meanRank <= 60.0, s"mean exact rank of ADC picks $meanRank (random ~250)")
  }

  test("refine: full-width shortlist reproduces the brute-force float top-k; ranks follow exact d2") {
    import spark.implicits._
    val n = emb.count().toInt
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, k = 8, iters = 0)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val queries = emb.filter(col("vec_id") < 4)
    // shortlist = whole corpus ⇒ the lossy stage nominates everyone
    // and refine must return exactly the brute-force float top-3
    val refined = Similarity.pqAdcRefineTopK(codes, books, emb, queries,
      "vec_id", "embedding", shortlist = n, k = 3)
      .orderBy("query_id", "rk").collect()
    val all = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val expect = (0L until 4L).flatMap { qid =>
      val qv = all.find(_._1 == qid).get._2
      all.filter(_._1 != qid)
        .map { case (nid, nv) =>
          val d = nv.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
          (nid, math.floor(d * 1e4 + 0.5) / 1e4)
        }
        .sortBy { case (nid, d) => (d, nid) }.take(3).map(_._1)
    }
    assert(refined.map(_.getLong(1)).toSeq == expect, "full-shortlist refine != brute force")
    // within each query, rk order must follow exact_d2 (adc_d2 may disagree)
    refined.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(byRk.sameElements(byRk.sorted), "rk does not follow exact_d2")
    }
  }

  test("IVF-PQ with exhaustive probing equals the full ADC scan; pruning only removes rows") {
    import spark.implicits._
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    val cents = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 2)
      .select(col("centroid_id").as("vec_id"), col("centroid").as("embedding"))
    val queries = emb.filter(col("vec_id") < 6)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val full = Similarity.pqAdcTopK(codes, books, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // nprobe = nCells: every member scanned -> identical result
    val exhaustive = Similarity.ivfPqTopK(emb, cents, books, queries,
      "vec_id", "embedding", nprobe = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(exhaustive == full, "exhaustive probing diverged from the full ADC scan")
    // pruned probing: each returned (query, neighbor, d2) exists in the
    // full scan with the same distance — routing changes WHICH members
    // are scanned, never the arithmetic
    val pruned = Similarity.ivfPqTopK(emb, cents, books, queries,
      "vec_id", "embedding", nprobe = 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val fullD = full.map { case (q, n, d, _) => (q, n) -> d }.toMap
    // distances for pruned picks must match the full scan's where present;
    // compute the reference distance directly when outside the top-k set
    val codesMap = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val qvs = emb.filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val sub = books(0)(0).length
    pruned.foreach { case (q, n, d) =>
      val expected = fullD.getOrElse((q, n), {
        val qv = qvs(q)
        val raw = codesMap(n).zipWithIndex.map { case (c, s) =>
          (0 until sub).map(t => math.pow(qv(s * sub + t) - books(s)(c)(t), 2)).sum
        }.sum
        math.floor(raw * 1e4 + 0.5) / 1e4
      })
      assert(math.abs(d - expected) < 1e-9, s"ADC distance mismatch for ($q,$n): $d vs $expected")
    }
  }

  test("zero-iteration training returns the id-ordered init slices (e15's oracle contract)") {
    import spark.implicits._
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, k = 8, iters = 0)
    val first = emb.orderBy(col("vec_id")).limit(8)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]].collect()
    for (s <- 0 until 4; j <- 0 until 8)
      assert(books(s)(j).toSeq == first(j).slice(s * 16, (s + 1) * 16),
        s"init codeword ($s,$j) is not the raw vector slice")
  }

  test("encoding is independent of input partitioning") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val a = Similarity.pqEncode(emb, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Similarity.pqEncode(emb.repartition(13), "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }
}
