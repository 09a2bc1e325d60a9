package graft

/** Dev A/B harness with the official bench's exact timing discipline
  * (optimization round 13): per query, plan-warm at sf0.001, one
  * untimed cold pass at the target sf, then the MEDIAN of five
  * gc-quiesced warm passes — BenchOne's single un-quiesced pass reads
  * up to 1.5× across JVMs (d28 read 3.1 and 4.5 s for identical
  * code), which is exactly the variance this methodology exists to
  * fold out. Same session config as [[Bench]], filled-grid cache
  * included. Usage: runMain graft.BenchMed [sfDir] name...
  */
object BenchMed {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.nonEmpty && args(0).startsWith("/")) (args(0), args.drop(1).toSeq)
      else (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), args.toSeq)
    val spark = GraftSession.local()
    spark.conf.set("spark.graft.filledGrid.cache", "true")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case scala.util.control.NonFatal(_) => () }
      fn(spark, sfDir).count() // cold target-sf pass, untimed
      val times = (1 to 5).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(times.length / 2)
      println(f"[benchmed] $name median $med%.3f s " +
        times.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
