package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the target scale
  * factor, after warming the JVM + codegen caches with one untimed
  * pass of each plan at sf0.001 (so timings measure the plan, not
  * first-query JIT warmup).
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
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(_) => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
