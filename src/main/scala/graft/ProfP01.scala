package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: time the p01 fleet pipeline end-to-end on a real SF
  * dir, separating scan+dayStats from the solver stage, to localize
  * bench cost (round-6 regression hunt).
  */
object ProfP01 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("prof-p01").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm(name: String)(f: => Any): Unit = {
      val a = System.nanoTime(); f; val b = System.nanoTime()
      println(f"[prof-p01] $name%-22s ${(b - a) / 1e9}%.2f s")
    }
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id").as("site"), col("ts"), col("value"))
    ev.cache().count()
    tm("dayStats only") {
      graft.analyses.Pipeline.dayStats(ev, "site", "ts", "value").count()
    }
    (1 to 3).foreach { i =>
      tm(s"full run #$i") {
        graft.analyses.Pipeline.run(spark, ev, "site", "ts", "value").toDF().count()
      }
    }
    val ds = graft.analyses.Pipeline.run(spark, ev, "site", "ts", "value")
    println(ds.queryExecution.executedPlan.toString().take(6000))
    val rdd = ds.toDF().rdd
    println(s"[prof-p01] solver-output partitions: ${rdd.getNumPartitions}")
    val perPart = rdd.mapPartitionsWithIndex { (i, it) => Iterator((i, it.size)) }.collect()
    println(s"[prof-p01] sites per partition: ${perPart.sortBy(_._1).map(_._2).mkString(",")}")
    spark.stop()
  }
}
