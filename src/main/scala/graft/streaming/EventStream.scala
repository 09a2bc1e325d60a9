package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Structured Streaming face of the engine (SURVEY §2.11 — an
  * extension, not a port requirement: the reference is batch-only).
  *
  * Incremental per-site quality monitoring: file-arrival (or
  * `Trigger.AvailableNow`) micro-batches → watermarked windowed
  * aggregation of the same DayStats metrics the batch path computes.
  * State is bounded by the watermark; at fleet scale the shuffle keys
  * are (site, window) — the same partitioning the batch plan uses.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Read a directory of parquet/json event files as a stream. */
  def readEvents(spark: SparkSession, path: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(path)

  /** Hourly per-site rollup with a 30-minute watermark for late
    * scans: count, energy sum, density proxy, max.
    */
  def hourlyStats(events: DataFrame, capacityHint: Double): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("user_id"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("value")).as("sum_v"),
        max(col("value")).as("max_v"),
        avg(when(col("value") > capacityHint * 0.02, 1.0).otherwise(0.0)).as("density")
      )
      .select(
        col("win.start").as("window_start"),
        col("user_id"), col("n_obs"), col("sum_v"), col("max_v"), col("density")
      )

  /** Drive a streaming aggregation synchronously over whatever data is
    * present (test/backfill path): AvailableNow + memory sink.
    */
  def runAvailableNow(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
