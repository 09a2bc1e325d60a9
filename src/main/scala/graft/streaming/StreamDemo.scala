package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Demo / smoke main for the streaming face: stages the events table
  * as a file-source directory, runs the hourly rollup as a real
  * streaming query (AvailableNow), and prints the emitted row count.
  *
  * Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(dir)
    val agg = EventStream.hourlyStats(EventStream.readEvents(spark, dir), capacityHint = 100.0)
    val out = EventStream.runAvailableNow(spark, agg, "hourly_demo")
    val n = out.count()
    val sample = out.orderBy(col("window_start"), col("user_id")).limit(3).collect()
    println(s"[stream-demo] emitted $n finalized (site, hour) rows")
    sample.foreach(r => println(s"[stream-demo] $r"))
    spark.stop()
  }
}
