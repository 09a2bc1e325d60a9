package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, chunk/frame-sample
  * them, and run (stubbed) decode/feature extraction.
  *
  * The Spark-side mechanics — schema, partitioning, chunk explosion,
  * batch shape — are real and tested; the *decode* step is a
  * deterministic fake (this container ships no image/audio codecs).
  * Swap [[decodeStub]] for a real codec UDF (e.g. `mapInPandas` /
  * JNI decoder) in production; everything around it is unchanged.
  *
  * Scale: metadata and chunking are scan-side column expressions (no
  * shuffle); chunk explosion multiplies rows by ~bytes/chunkSize, so
  * repartition by (id) after exploding if a downstream stage
  * aggregates per-blob.
  */
object Multimodal {

  /** Attach the payload as a binary column (here: UTF-8 bytes of a
    * text column standing in for a real media payload).
    */
  def withBlob(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("blob", col(payloadCol).cast("binary"))

  /** Typed metadata for an opaque blob: byte length, leading magic
    * bytes (format sniffing), chunk count at `chunkSize`.
    */
  def blobMeta(df: DataFrame, chunkSize: Int): DataFrame =
    df.withColumn("n_bytes", length(col("blob")).cast("long"))
      .withColumn("magic_hex", hex(substring(col("blob"), 1, 4)))
      .withColumn("n_chunks", ceil(col("n_bytes") / lit(chunkSize.toDouble)).cast("long"))

  /** Explode a blob into fixed-size chunks: (id, chunk_idx, chunk).
    * This is the batch shape a real decoder consumes.
    */
  def chunks(df: DataFrame, idCol: String, chunkSize: Int): DataFrame =
    df.withColumn("n_chunks", ceil(length(col("blob")) / lit(chunkSize.toDouble)).cast("int"))
      .withColumn("chunk_idx", explode(sequence(lit(0), greatest(col("n_chunks") - 1, lit(0)))))
      .withColumn("chunk", expr(s"substring(blob, chunk_idx * $chunkSize + 1, $chunkSize)"))
      .select(col(idCol), col("chunk_idx"), col("chunk"))

  /** Frame sampling: keep every k-th chunk (video frame-sample
    * pattern).
    */
  def frameSample(chunked: DataFrame, k: Int): DataFrame =
    chunked.filter(pmod(col("chunk_idx"), lit(k)) === 0)

  /** STUB decoder: deterministic fake features standing in for a real
    * image/audio decode (codec libs unavailable in this environment).
    * Emits the feature *schema* a real decoder would: a fixed-width
    * numeric feature struct per blob.
    */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("f_first_byte", ascii(substring(col("blob").cast("string"), 1, 1)))
      .withColumn("f_last_byte", ascii(expr("substring(CAST(blob AS STRING), length(CAST(blob AS STRING)), 1)")))
      .withColumn("f_content_hash", md5(col("blob").cast("string")))
}
