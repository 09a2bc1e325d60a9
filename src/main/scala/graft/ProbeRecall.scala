package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame

/** Same-JVM A/B for the recall-gate rewrite (optimization round 14):
  * the round-13 gate consumed `exact` twice and `approx` twice (hit
  * join + invariants + top-list agg) so the serving subtrees re-ran
  * per consumer; the new gate reduces each side once and joins once.
  * Usage: runMain graft.ProbeRecall [sfDir]
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    import graft.operators.Similarity

    // the round-13 gate, verbatim
    def oldGate(exact: DataFrame, approx: DataFrame, k: Int, floorPct: Int): DataFrame = {
      val hits = exact.select(col("query_id"), col("neighbor_id"))
        .join(approx.select(col("query_id"), col("neighbor_id")), Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("__h"))
      val perQ = approx.groupBy(col("query_id")).agg(
        count(lit(1)).as("__n"),
        sum(when(col("neighbor_id") === col("query_id"), 1L).otherwise(0L)).as("__self"))
      val w = Window.partitionBy()
      exact.groupBy(col("query_id"))
        .agg(sort_array(collect_list(col("neighbor_id"))).as("__ex"))
        .join(hits, Seq("query_id"), "left")
        .join(perQ, Seq("query_id"), "left")
        .select(
          col("query_id"),
          array_join(col("__ex"), ",").as("exact_top3"),
          (coalesce(col("__n"), lit(0L)) === k).as("k_rows_returned"),
          (coalesce(col("__self"), lit(0L)) === 0L).as("no_self_match"),
          (sum(coalesce(col("__h"), lit(0L))).over(w) * 100L >=
            count(lit(1)).over(w) * (floorPct.toLong * k)).as("fleet_recall_ok"))
    }

    // the round-13 kmeansFit, verbatim (no cross-pass persist)
    def oldKmeansFit(vectors: DataFrame, idCol: String, vecCol: String,
        k: Int, iters: Int): DataFrame = {
      val v = vectors.select(col(idCol), col(vecCol).cast("array<double>").as("vv"))
      var cents: Array[(Long, Array[Double])] = v
        .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(k)
        .collect()
        .zipWithIndex
        .map { case (r, i) => i.toLong -> r.getSeq[Double](1).toArray }
      var it = 0
      while (it < iters) {
        import spark.implicits._
        val updated = v
          .select(Similarity.centroidArgminExpr(col("vv"), cents).as("cid"), col("vv"))
          .as[(Long, Seq[Double])]
          .rdd
          .map { case (cid, vv) => cid -> (vv.toArray, 1L) }
          .reduceByKey { (a, b) =>
            val s = a._1.clone()
            var i = 0
            while (i < s.length && i < b._1.length) { s(i) += b._1(i); i += 1 }
            (s, a._2 + b._2)
          }
          .mapValues { case (sum, n) => sum.map(_ / n) }
          .collect()
          .sortBy(_._1)
        val byId = updated.toMap
        cents = cents.map { case (cid, old) => cid -> byId.getOrElse(cid, old) }
        it += 1
      }
      val out = cents.toSeq.map { case (cid, cv) => (cid, cv.toSeq) }
      spark.createDataset(out)(org.apache.spark.sql.Encoders.product)
        .toDF("centroid_id", "centroid")
        .select(col("centroid_id"), col("centroid").cast("array<double>"))
    }

    def e18Pair(): (DataFrame, DataFrame) = {
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < 16)
      val cents = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = 3)
        .select(col("centroid_id").as("vec_id"), col("centroid").as("embedding"))
      val approx = Similarity.ivfTopK(emb, cents, q, "vec_id", "embedding", nprobe = 2, k = 3)
      (Similarity.cosineTopK(q, emb, "vec_id", "embedding", 3), approx)
    }

    // parity: the two gates must emit identical rows
    val (ex0, ap0) = e18Pair()
    val newDf = SparkEntry.queries("e18_ivf_recall_gate")(spark, dir)
    val oldDf = oldGate(ex0, ap0, 3, 30)
    val mism = newDf
      .join(oldDf.withColumnRenamed("exact_top3", "t0").withColumnRenamed("k_rows_returned", "k0")
          .withColumnRenamed("no_self_match", "s0").withColumnRenamed("fleet_recall_ok", "f0"),
        Seq("query_id"), "full")
      .filter(col("exact_top3") =!= col("t0") || col("k_rows_returned") =!= col("k0") ||
        col("no_self_match") =!= col("s0") || col("fleet_recall_ok") =!= col("f0") ||
        col("exact_top3").isNull =!= col("t0").isNull)
      .count()
    println(s"[proberecall] gate mismatches: $mism (must be 0)")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[proberecall] $label ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    (1 to 3).foreach { rep =>
      System.gc()
      time(s"e18 old gate rep$rep") { val (e, a) = e18Pair(); oldGate(e, a, 3, 30).count() }
      System.gc()
      time(s"e18 new gate rep$rep") {
        SparkEntry.queries("e18_ivf_recall_gate")(spark, dir).count()
      }
    }
    // kmeansFit cross-pass persist in isolation (training is
    // driver-eager, so .count on the tiny centroid table is the train)
    val embK = graft.sources.Tables.embeddings(spark, dir)
    (1 to 3).foreach { rep =>
      System.gc()
      time(s"kmeans old (no persist) rep$rep") {
        oldKmeansFit(embK, "vec_id", "embedding", 8, 3).count()
      }
      System.gc()
      time(s"kmeans new (persisted) rep$rep") {
        Similarity.kmeansFit(embK, "vec_id", "embedding", 8, 3).count()
      }
    }
    spark.stop()
  }
}
