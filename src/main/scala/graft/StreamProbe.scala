package graft

import org.apache.spark.sql.functions._

/** Dev utility: break down the streaming-LSH cost — batch evaluation
  * of the scalar band-signature expression vs the full stateful
  * streaming query, so throughput work targets the real bottleneck.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val n = docs.count()

    def tm(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[streamprobe] $label%-28s $sec%7.2f s  ($rows rows, ${n / sec}%.0f docs/s)")
    }

    // batch evaluation of the same scalar signature expression —
    // aggregate over the VALUES so pruning can't skip the md5/min-fold
    (1 to 2).foreach { pass =>
      tm(s"bandSigs-batch pass$pass") {
        docs.select(col("doc_id"),
            explode(graft.streaming.DocStream.bandSigs(col("text"), 3, 32, 4)).as("bs"))
          .agg(count(col("bs.band_sig")), max(length(col("bs.band_sig"))))
          .collect()(0).getLong(0)
      }
    }
    // batch path signatures (shingle-row aggregation) for comparison
    tm("batch lshBands (d07 path)") {
      val sh = graft.operators.Dedup.charShingles(docs, "doc_id", "text", 3)
      graft.operators.Dedup.lshBandsFromShingles(sh, "doc_id", 32, 4).count()
    }
    // batch-mode equivalent of the stateful shape: same key, same
    // per-bucket pair emission, no state store — isolates streaming
    // machinery cost from the grouping/compute cost
    tm("batch groupByKey twin") {
      import spark.implicits._
      val bands = docs
        .select(col("doc_id"),
          explode(graft.streaming.DocStream.bandSigs(col("text"), 3, 32, 4)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.band_sig").as("band_sig"))
        .as[(Long, Int, String)]
      bands
        .groupByKey(r => s"${r._2}:${r._3}")
        .flatMapGroups { (key: String, it: Iterator[(Long, Int, String)]) =>
          val band = key.takeWhile(_ != ':').toInt
          val ids = it.map(_._1).toArray.sorted
          for (i <- ids.indices.iterator; j <- (i + 1) until ids.length)
            yield (ids(i), ids(j), band)
        }
        .count()
    }
    // the full stateful streaming query
    tm("incrementalLshCandidates") {
      val src = java.nio.file.Files.createTempDirectory("sprobe").toString
      val ckpt = java.nio.file.Files.createTempDirectory("sprobeckpt").toString
      val out = java.nio.file.Files.createTempDirectory("sprobeout").toString
      docs.write.mode("overwrite").parquet(src)
      spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          println(s"[streamprobe]   batch ${p.batchId}: rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs} stateRows=${Option(p.stateOperators).map(_.map(_.numRowsTotal).mkString(",")).getOrElse("")}")
        }
      })
      val r = graft.streaming.DocStream.incrementalLshCandidates(spark, src, ckpt, out).count()
      val batchDirs = Option(new java.io.File(out).listFiles()).map(_.length).getOrElse(0)
      println(s"[streamprobe]   batch dirs in sink: $batchDirs")
      r
    }
    // state-store-count sensitivity: each stream shuffle partition
    // carries a state store whose per-batch open/commit cost is fixed,
    // so at 5k docs the 32-store default pays machinery, not work
    for (parts <- Seq(16, 8, 4)) {
      tm(s"incrementalLshCandidates p=$parts") {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try {
          val src = java.nio.file.Files.createTempDirectory("sprobe").toString
          val ckpt = java.nio.file.Files.createTempDirectory("sprobeckpt").toString
          val out = java.nio.file.Files.createTempDirectory("sprobeout").toString
          docs.write.mode("overwrite").parquet(src)
          graft.streaming.DocStream.incrementalLshCandidates(spark, src, ckpt, out).count()
        } finally spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
    }
    spark.stop()
  }
}
