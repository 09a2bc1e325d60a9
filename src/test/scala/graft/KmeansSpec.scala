package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** Lloyd's k-means trainer: deterministic, objective non-increasing,
  * and its centroids slot into the existing assignment operator.
  */
class KmeansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def objective(cents: org.apache.spark.sql.DataFrame): Double =
    Similarity
      .assignToCentroids(
        emb.select(col("vec_id"), col("embedding")),
        cents.select(col("centroid_id").as("vec_id"), col("centroid").as("embedding")),
        "vec_id", "embedding")
      .agg(sum(col("d2"))).collect()(0).getDouble(0)

  test("objective is non-increasing over iterations and the fit is partition-independent") {
    val objs = Seq(0, 1, 3, 6).map { it =>
      objective(Similarity.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = it))
    }
    objs.zip(objs.tail).foreach { case (a, b) =>
      assert(b <= a + 1e-3, s"objective rose across iterations: $objs")
    }
    assert(objs.last < objs.head, s"no improvement at all: $objs")

    // partition independence up to float summation order of the means
    // (the map-side combine folds partitions in arbitrary order)
    val fitA = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val fitB = Similarity.kmeansFit(emb.repartition(7), "vec_id", "embedding", k = 8, iters = 3)
    assert(fitA.count() == 8)
    val maxDelta = fitA.join(fitB.withColumnRenamed("centroid", "c2"), Seq("centroid_id"))
      .select(expr(
        "aggregate(zip_with(centroid, c2, (a, b) -> abs(a - b)), 0D, (m, x) -> greatest(m, x))"))
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect()
      .max
    assert(maxDelta < 1e-9, s"centroids drift $maxDelta across partitionings")
  }
}
