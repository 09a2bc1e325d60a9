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

  /** Exact binary dedup groups: blobs with identical bytes collapse
    * onto one digest row (digest, group size, min-id keeper, byte
    * length). The media counterpart of the text corpus's d02 — at
    * 100 TB only 32-byte digests shuffle, never payloads.
    *
    * @param minGroupSize keep groups of at least this many blobs
    *   (2 = dup groups only; 1 = the full digest census, which is
    *   what the cross-engine gate pins so corpora with no byte-exact
    *   dups still verify real values)
    * @return (digest, n_blobs, keeper_id, n_bytes, is_dup)
    */
  def exactBlobGroups(df: DataFrame, idCol: String, minGroupSize: Int = 2): DataFrame =
    df.select(col(idCol), md5(col("blob")).as("digest"),
        length(col("blob")).cast("long").as("__nb"))
      .groupBy(col("digest"))
      .agg(
        count(lit(1)).as("n_blobs"),
        min(col(idCol)).as("keeper_id"),
        min(col("__nb")).as("n_bytes"))
      .filter(col("n_blobs") >= minGroupSize)
      .withColumn("is_dup", col("n_blobs") >= 2)

  /** Chunk-level shared-content pairs (the CDC/storage-dedup idea
    * applied to media payloads: two blobs sharing most fixed-offset
    * chunk digests are versions of the same asset). Postings-list
    * equi-join on the chunk digest — never a blob cross join — with
    * the standard boilerplate cap: a chunk present in more than
    * `maxDocsPerChunk` blobs (a codec header, a silence frame) is
    * dropped BEFORE the pair join, bounding bucket fan-out at corpus
    * scale. Containment is measured against the TRUE distinct-chunk
    * counts (computed before the cap), quantized on the portable
    * 6-dp product grid.
    *
    * @return (a_id, b_id, shared, na, nb, containment) for pairs with
    *   containment ≥ minContainment
    */
  def chunkSharedPairs(
      df: DataFrame,
      idCol: String,
      chunkSize: Int,
      maxDocsPerChunk: Int,
      minContainment: Double
  ): DataFrame = {
    val ch = chunks(df, idCol, chunkSize)
      .select(col(idCol), md5(col("chunk")).as("h"))
      .distinct()
    val sizes = ch.groupBy(col(idCol)).agg(count(lit(1)).as("n_ch"))
    val keep = ch.groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= maxDocsPerChunk)
      .select(col("h"))
    val capped = ch.join(keep, Seq("h"), "left_semi")
    val pairs = capped.select(col("h"), col(idCol).as("a_id"))
      .join(capped.select(col("h"), col(idCol).as("b_id")), Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"))
    // sizes is blob-grain (corpus cardinality) — no broadcast hint;
    // AQE broadcasts it when small and shuffle-joins at 100 TB
    pairs
      .join(sizes.select(col(idCol).as("a_id"), col("n_ch").as("na")), Seq("a_id"))
      .join(sizes.select(col(idCol).as("b_id"), col("n_ch").as("nb")), Seq("b_id"))
      .withColumn("containment",
        round(col("shared").cast("double") / least(col("na"), col("nb")).cast("double") * lit(1e6)) / lit(1e6))
      .filter(col("containment") >= minContainment)
      .select(col("a_id"), col("b_id"), col("shared"), col("na"), col("nb"), col("containment"))
  }
}
