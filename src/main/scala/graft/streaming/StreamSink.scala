package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Shared idempotent parquet sink for the append-mode streaming
  * twins.
  *
  * A blind `mode("append")` in foreachBatch is AT-LEAST-ONCE: a crash
  * between the parquet commit and the checkpoint offset commit
  * replays the batch on restart and duplicates its rows — breaking
  * the twins' "emitted exactly once" contract. Here each micro-batch
  * OVERWRITES its own `batch_id=N` subdirectory instead, so a
  * replayed batch rewrites the same partition (batch ids are assigned
  * by the checkpoint and stay stable across restarts) and the output
  * stays exactly-once end-to-end.
  *
  * A run that emits nothing (routine on the first ingest tick, when
  * no day has closed / no duplicate exists yet) seeds an empty,
  * schema-full partition so the final read returns an empty frame
  * instead of throwing path-not-found.
  */
private[streaming] object StreamSink {

  def runAppend(
      spark: SparkSession,
      out: DataFrame,
      checkpoint: String,
      outDir: String,
      trigger: Trigger
  ): DataFrame = {
    val schema = out.schema
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
    q.awaitTermination()
    val dir = new java.io.File(outDir)
    val parts = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    if (parts.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .write.mode("overwrite").parquet(s"$outDir/batch_id=-1")
    }
    spark.read.parquet(outDir).drop("batch_id")
  }
}
