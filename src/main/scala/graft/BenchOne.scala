package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a subset of SparkEntry queries by name (args =
  * query names; args(0) may be the sf dir). Same session config as
  * [[Bench]]; each query is warmed at sf0.001 first, then timed twice
  * (cold plan + warm plan) at the target sf.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.nonEmpty && args(0).startsWith("/")) (args(0), args.drop(1).toSeq)
      else (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), args.toSeq)
    val spark = GraftSession.local()
    val qs = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names
    qs.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case scala.util.control.NonFatal(_) => () }
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[benchone] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
