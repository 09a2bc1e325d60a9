package graft
import org.apache.spark.sql.functions._
object ProbeE23 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("16")
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.sources.Tables.embeddings(spark, sf)
      val q = emb.filter(col("vec_id") < 16)
      val book = graft.operators.Similarity.kmeansFitSharded(
        emb, "vec_id", "embedding", kCoarse = 4, kFine = 2, iters = 3)
      val cents = book.select(col("centroid_id").as("vec_id"), col("centroid").as("embedding"))
      val approx = graft.operators.Similarity.ivfTopK(emb, cents, q, "vec_id", "embedding", nprobe = 2, k = 3)
      val exact = graft.operators.Similarity.cosineTopK(q, emb, "vec_id", "embedding", 3)
      def recall(a: org.apache.spark.sql.DataFrame): Double =
        exact.select(col("query_id"), col("neighbor_id"))
          .join(a.select(col("query_id"), col("neighbor_id")), Seq("query_id", "neighbor_id"))
          .count().toDouble / (16 * 3)
      val hier = graft.operators.Similarity.ivfTopKSharded(emb, book, q, "vec_id", "embedding",
        nprobeShards = 2, nprobe = 2, k = 3)
      println(s"[probeE23] $sf flat_recall=${recall(approx)} hier_recall=${recall(hier)}")
    }
    spark.stop()
  }
}
