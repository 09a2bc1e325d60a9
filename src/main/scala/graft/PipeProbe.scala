package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the p01 fleet pipeline. */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    import graft.analyses.Pipeline

    def tm(name: String)(f: => Long): Unit = {
      val a = System.nanoTime(); val n = f; val b = System.nanoTime()
      println(f"[probe] $name%-24s ${(b - a) / 1e9}%.3f s ($n rows)")
    }
    val ev = () => Tables.events(spark, sfDir).select(col("user_id").as("site"), col("ts"), col("value"))
    (1 to 2).foreach { pass =>
      println(s"[probe] -- pass $pass --")
      tm("events scan")(ev().count())
      tm("capacity")(graft.operators.DayStats.capacity(ev(), "site", "value").count())
      tm("dayStats")(Pipeline.dayStats(ev(), "site", "ts", "value").count())
      tm("dayRows (+smoothness)")(Pipeline.dayRows(ev(), "site", "ts", "value").count())
      tm("full run")(Pipeline.run(spark, ev(), "site", "ts", "value").toDF().count())
    }
    // driver-side analyzeSite on the REAL per-site day rows (the
    // run() assembly, smoothness column included)
    val rows = Pipeline.dayRows(ev(), "site", "ts", "value")
    import spark.implicits._
    val collected = rows
      .select(col("site"), col("day_idx").as("dayIdx"), col("energy"),
        col("density"), col("daily_max").as("dailyMax"),
        col("com_hour").as("comHour"), col("n_obs").as("nObs"),
        col("capacity"), col("smoothness"))
      .as[graft.analyses.DayRow]
      .collect().groupBy(_.site)
    println(s"[probe] collected ${collected.size} sites")
    val t0 = System.nanoTime()
    val reports = collected.map { case (s, ds) => Pipeline.analyzeSite(s, ds.sortBy(_.dayIdx)) }
    println(f"[probe] driver analyzeSite all sites: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val nErr = reports.count(_.errors.nonEmpty)
    println(s"[probe] sites with stage errors: $nErr; sample: ${reports.find(_.errors.nonEmpty).map(_.errors).getOrElse("")}")
    spark.stop()
  }
}
