package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.VecStream

/** Streaming semantic dedup: verdicts equal the batch
  * `Similarity.semanticDedup` output when vectors arrive in id order,
  * across checkpointed micro-batches.
  */
class VecStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("incremental semantic dedup equals the batch verdicts across a checkpointed restart") {
    val src = java.nio.file.Files.createTempDirectory("vecsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vecckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("vecout").toString

    val cents = emb.filter(col("vec_id") < 8)
    val centArr = cents
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

    // id-ordered arrival: batch drop rule (vs smaller ids) == arrival rule
    emb.filter(col("vec_id") < 60).write.mode("append").parquet(src)
    VecStream.incrementalSemanticDedup(spark, src, ckpt, outDir, centArr, threshold = 0.4)
    emb.filter(col("vec_id") >= 60).write.mode("append").parquet(src)
    val got = VecStream.incrementalSemanticDedup(spark, src, ckpt, outDir, centArr, threshold = 0.4)
      .select("vec_id", "centroid_id", "is_dropped")

    assert(got.count() == emb.count(), "every vector needs exactly one verdict")
    val expect = Similarity.semanticDedup(emb, cents, "vec_id", "embedding", 0.4)
      .select(col("vec_id"), col("centroid_id").cast("long").as("centroid_id"), col("is_dropped"))
    assert(got.except(expect).count() == 0, "streaming verdicts absent from batch output")
    assert(expect.except(got).count() == 0, "batch verdicts missing from the stream")
    assert(got.filter(col("is_dropped")).count() > 0, "no drops — test has no signal")
  }

  test("incremental bucketed near-dup pairs equal the batch equi-join across a restart") {
    val src = java.nio.file.Files.createTempDirectory("bndsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bndckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("bndout").toString

    val planesDf = emb.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      .withColumn("plane_id", (col("vec_id") - 8).cast("int"))
    val planeArr = planesDf
      .select(col("plane_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)

    emb.filter(col("vec_id") < 250).write.mode("append").parquet(src)
    VecStream.incrementalBucketNearDup(spark, src, ckpt, outDir, planeArr, threshold = 0.3)
    emb.filter(col("vec_id") >= 250).write.mode("append").parquet(src)
    val got = VecStream.incrementalBucketNearDup(spark, src, ckpt, outDir, planeArr, threshold = 0.3)
      .select("a_id", "b_id", "cosine")

    val expect = Similarity.cosineNearDupPairs(emb, planesDf, "vec_id", "embedding", 0.3)
      .select("a_id", "b_id", "cosine")
    assert(got.count() > 0, "no pairs — test has no signal")
    assert(got.except(expect).count() == 0, "streamed pairs absent from batch output")
    assert(expect.except(got).count() == 0, "batch pairs missing from the stream")
  }

  test("incremental cell stats snapshot equals the batch per-cell aggregation") {
    val src = java.nio.file.Files.createTempDirectory("cellsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cellckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("cellout").toString

    val cents = emb.filter(col("vec_id") < 8)
    val centArr = cents
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

    emb.filter(col("vec_id") < 200).write.mode("append").parquet(src)
    VecStream.incrementalCellStats(spark, src, ckpt, outDir, centArr)
    emb.filter(col("vec_id") >= 200).write.mode("append").parquet(src)
    val got = VecStream.incrementalCellStats(spark, src, ckpt, outDir, centArr)
      .select("centroid_id", "n_vecs", "mean_d2", "max_d2")

    val expect = Similarity.assignToCentroids(emb, cents, "vec_id", "embedding")
      .groupBy(col("centroid_id").cast("long").as("centroid_id"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("d2")), 4).as("mean_d2"),
        max(col("d2")).as("max_d2"))
    assert(got.count() > 1, "stats need at least two occupied cells for signal")
    assert(got.except(expect).count() == 0 && expect.except(got).count() == 0,
      "streaming snapshot diverged from the batch per-cell aggregation")
  }

  test("state TTL evicts cold clusters: a late near-dup of cold members is kept") {
    val src = java.nio.file.Files.createTempDirectory("vttlsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vttlckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("vttlout").toString
    val ttl = 500L

    val cents = emb.filter(col("vec_id") < 8)
    val centArr = cents
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

    emb.filter(col("vec_id") === 10).write.mode("append").parquet(src)
    VecStream.incrementalSemanticDedup(spark, src, ckpt, outDir, centArr, ttlMs = ttl)
    Thread.sleep(2 * ttl + 500)

    // unrelated tick fires vec 10's cluster timeout and evicts it
    emb.filter(col("vec_id") === 11).write.mode("append").parquet(src)
    VecStream.incrementalSemanticDedup(spark, src, ckpt, outDir, centArr, ttlMs = ttl)

    // an exact copy of vec 10 (cosine 1.0) arrives after eviction:
    // warm state would drop it; cold -> kept (the documented tradeoff)
    emb.filter(col("vec_id") === 10).withColumn("vec_id", lit(888L))
      .write.mode("append").parquet(src)
    val out = VecStream.incrementalSemanticDedup(spark, src, ckpt, outDir, centArr, ttlMs = ttl)
    val v = out.filter(col("vec_id") === 888L).collect()
    assert(v.length == 1 && !v.head.getAs[Boolean]("is_dropped"),
      "cold cluster still dropped the late near-dup")
  }
}
