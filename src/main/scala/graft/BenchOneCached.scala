package graft
object BenchOneCached {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.conf.set("spark.graft.filledGrid.cache", "true")
    val sfDir = "/root/testdata/sf0.1"
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case scala.util.control.NonFatal(_) => () }
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[b1c] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
