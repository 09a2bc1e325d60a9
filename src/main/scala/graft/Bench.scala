package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the target scale
  * factor.
  *
  * Noise control (round-4): a 112-query suite in one JVM pollutes
  * single-pass timings with JIT, GC, and code-cache churn — r3's
  * in-suite numbers read 3–6× the isolated times for the same plans.
  * So each query is (1) plan-warmed at sf0.001, (2) executed once
  * untimed at the TARGET sf, then (3) timed on a second target-sf
  * pass. The reported per-query number is the warm pass — reproducible
  * within the run-to-run noise of an isolated BenchOne run. The cold
  * (first target-sf) pass total is kept as "cold_total" so scan-cache
  * effects stay visible.
  *
  * Also reports one Structured Streaming throughput line
  * (`incrementalLshCandidates` docs/sec over the target-sf documents
  * table) so the streaming face has a perf signal.
  *
  * Prints one JSON line: {"metric":"total","value":N,"unit":"sec",...}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val spark = GraftSession.local()

    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case scala.util.control.NonFatal(_) => () }
    }

    // A failed query is reported as -1 (never a plausible-looking
    // elapsed time) and listed under "failed"; fatal Throwables (OOM,
    // interrupts) propagate instead of being swallowed.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val coldOk =
        try { fn(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(_) => false }
      val cold = if (coldOk) (System.nanoTime() - t0) / 1e9 else -1.0
      val warm =
        if (!coldOk) -1.0
        else {
          val t1 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t1) / 1e9 }
          catch { case scala.util.control.NonFatal(_) => -1.0 }
        }
      name -> (cold, warm)
    }
    val qs = results.map { case (k, (_, w)) => "\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, w)) if w < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.collect { case (_, w) if w >= 0 => w }.sum
    val coldTotal = results.values.collect { case (c, _) if c >= 0 => c }.sum

    val streamJson = streamingLine(spark, sfDir)

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"cold_total":$coldTotal,"streaming":$streamJson,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** One streaming perf number: docs/sec through the stateful LSH
    * candidate pipeline (band-signature columns → flatMapGroupsWithState
    * bucket state → parquet append sink), AvailableNow over the
    * target-sf documents staged as a stream source. Failure reports
    * -1 rather than killing the batch bench.
    */
  private def streamingLine(spark: SparkSession, sfDir: String): String = {
    try {
      import org.apache.spark.sql.functions.col
      val src = java.nio.file.Files.createTempDirectory("benchstream").toString
      val ckpt = java.nio.file.Files.createTempDirectory("benchstreamckpt").toString
      val out = java.nio.file.Files.createTempDirectory("benchstreamout").toString
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      val nDocs = docs.count()
      docs.write.mode("overwrite").parquet(src)
      val t0 = System.nanoTime()
      graft.streaming.DocStream.incrementalLshCandidates(spark, src, ckpt, out)
      val sec = (System.nanoTime() - t0) / 1e9
      val rate = nDocs / sec
      s"""{"lsh_candidates_docs_per_sec":$rate,"docs":$nDocs,"sec":$sec}"""
    } catch {
      case scala.util.control.NonFatal(_) =>
        """{"lsh_candidates_docs_per_sec":-1}"""
    }
  }
}
