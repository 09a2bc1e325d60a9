package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity

/** Structured Streaming face of SEMANTIC dedup (`Similarity
  * .semanticDedup`'s incremental twin): embeddings arrive
  * continuously; each gets a final keep/drop verdict at arrival.
  *
  * The centroid ASSIGNMENT runs as a scalar expression — the argmin
  * over k centroids is a `least(...)` fold over `(round(dist2, 4),
  * centroid_id)` structs (struct comparison is lexicographic, so the
  * tie-break matches the batch window's `(d2, centroid_id)` order),
  * with the centroid vectors baked into the plan as literals: a
  * streaming query gets one stateful operator, so assignment must
  * arrive at the state op already decided, and centroids are small by
  * the IVF contract (they come from a driver-side collect).
  *
  * The stateful op mirrors the batch drop rule exactly: a vector is
  * dropped iff its rounded cosine to ANY earlier-SEEN member of its
  * cluster (kept or dropped — the batch a-side includes dropped
  * vectors) reaches the threshold. "Earlier" is arrival order
  * (append-only verdicts cannot be revised), so verdicts equal the
  * batch output whenever ids arrive in id order — `VecStreamSpec`
  * asserts that equality across checkpointed micro-batches. State per
  * cluster is its seen members' vectors, capped at `maxCluster`: the
  * cap bounds STATE, not matching — an arrival at a full cluster is
  * still compared against (and dropped by) the capped membership, it
  * just is not added, so only near-dups of post-cap arrivals are
  * missed.
  */
object VecStream {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))

  case class VecVerdict(vec_id: Long, centroid_id: Long, is_dropped: Boolean)

  /** @param centroids (centroid_id, vector) pairs, driver-side (small
    *   by the IVF contract); the batch twin derives them from a
    *   DataFrame — collect it before calling.
    * @param ttlMs optional sliding state TTL (same contract and
    *   `Trigger.Once` requirement as the `DocStream` twins — see
    *   `DocStream.incrementalExactDedup`): 0 keeps cluster members
    *   forever; > 0 evicts clusters untouched for ttlMs, so a
    *   near-dup of only-cold members is re-admitted as kept. This
    *   twin's state holds actual vectors (64 doubles per member), so
    *   production ingest over unbounded corpora wants the TTL most
    *   here.
    */
  def incrementalSemanticDedup(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      centroids: Array[(Long, Array[Double])],
      threshold: Double = 0.4,
      maxCluster: Int = 4096,
      ttlMs: Long = 0L
  ): DataFrame = {
    import spark.implicits._
    require(centroids.nonEmpty, "incrementalSemanticDedup needs at least one centroid")

    val vecD = col("embedding").cast("array<double>")
    val rows = spark.readStream.schema(vecSchema).format("parquet").load(path)
      .select(
        col("vec_id"),
        vecD.as("v"),
        Similarity.centroidArgminExpr(vecD, centroids).as("centroid_id"))
      .as[(Long, Array[Double], Long)]

    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val out = rows
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (cid: Long, it: Iterator[(Long, Array[Double], Long)],
         state: GroupState[Vector[(Long, Array[Double])]]) =>
          if (state.hasTimedOut) {
            state.remove() // cold cluster: forget its members
            Iterator.empty
          } else {
            var members = state.getOption.getOrElse(Vector.empty[(Long, Array[Double])])
            val verdicts = it.toArray.sortBy(_._1).map { case (id, v, _) =>
              val dropped = members.exists { case (_, m) => cosine5(v, m) >= threshold }
              if (members.length < maxCluster) members = members :+ (id -> v)
              VecVerdict(id, cid, dropped)
            }
            state.update(members)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            verdicts.iterator
          }
      }

    val trigger: Trigger =
      if (ttlMs > 0) Trigger.Once() else Trigger.AvailableNow()
    StreamSink.runAppend(spark, out.toDF(), checkpoint, outDir, trigger)
  }

  case class PairHit(a_id: Long, b_id: Long, cosine: Double)

  /** Streaming face of the BUCKETED near-dup default
    * (`Similarity.cosineNearDupPairs`'s incremental twin): vectors
    * arrive continuously, each lands in its sign-LSH bucket via a
    * stateless scalar expression (plane literals — same
    * `Similarity.dot` fold as the batch bucket computation, so the
    * bucket ids are bit-identical), and the stateful op emits every
    * (earlier-member, arrival) pair at or above the rounded-cosine
    * threshold the moment the LATER vector arrives. A pair is emitted
    * exactly once — when its second vector is processed — so after
    * any arrival order the emitted pair set equals the batch
    * equi-join's (a_id < b_id normalized), as long as no bucket
    * exceeds `maxBucket` (the cap bounds STATE: post-cap arrivals are
    * still compared against the capped membership but not added, the
    * `incrementalSemanticDedup` contract). `VecStreamSpec` asserts
    * batch equality across checkpointed micro-batches.
    */
  def incrementalBucketNearDup(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      planes: Array[(Int, Array[Double])],
      threshold: Double,
      maxBucket: Int = 4096,
      ttlMs: Long = 0L
  ): DataFrame = {
    import spark.implicits._
    require(planes.nonEmpty, "incrementalBucketNearDup needs at least one hyperplane")

    val vecD = col("embedding").cast("array<double>")
    val bucket = planes.map { case (j, p) =>
      when(Similarity.dot(vecD, typedLit(p.toSeq)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = spark.readStream.schema(vecSchema).format("parquet").load(path)
      .select(col("vec_id"), vecD.as("v"), bucket.as("bucket"))
      .as[(Long, Array[Double], Long)]

    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val out = rows
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (_: Long, it: Iterator[(Long, Array[Double], Long)],
         state: GroupState[Vector[(Long, Array[Double])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var members = state.getOption.getOrElse(Vector.empty[(Long, Array[Double])])
            val hits = scala.collection.mutable.ArrayBuffer.empty[PairHit]
            it.toArray.sortBy(_._1).foreach { case (id, v, _) =>
              members.foreach { case (mid, m) =>
                val c = cosine5(v, m)
                if (c >= threshold && mid != id)
                  hits += PairHit(math.min(id, mid), math.max(id, mid), c)
              }
              // re-delivered ids must not be stored twice: a second
              // copy would make every later neighbor emit the same
              // (a_id, b_id) pair once per stored copy, breaking the
              // documented batch-equality contract under duplicates
              if (members.length < maxBucket && !members.exists(_._1 == id))
                members = members :+ (id -> v)
            }
            state.update(members)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            hits.iterator
          }
      }

    val trigger: Trigger =
      if (ttlMs > 0) Trigger.Once() else Trigger.AvailableNow()
    StreamSink.runAppend(spark, out.toDF(), checkpoint, outDir, trigger)
  }

  /** IVF index-health monitor for continuous vector ingest: per-cell
    * occupancy and assignment-distance statistics as a complete-mode
    * snapshot. Assignment is the batch path's exact scalar rule
    * ([[Similarity.centroidBestExpr]] over broadcast-literal
    * centroids — stateless, zero shuffle before the k-row aggregate),
    * so after ANY tick the snapshot equals the batch per-cell
    * aggregation of [[Similarity.assignToCentroids]] over everything
    * ingested (`VecStreamSpec`-asserted). State is one row per cell
    * (k rows total, the IVF contract). Skewed occupancy or a
    * drifting mean distance is the standard "retrain the coarse
    * quantizer" signal a production ANN ingest watches.
    *
    * @return snapshot (centroid_id, n_vecs, mean_d2, max_d2)
    */
  def incrementalCellStats(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      centroids: Array[(Long, Array[Double])]
  ): DataFrame = {
    require(centroids.nonEmpty, "incrementalCellStats needs at least one centroid")
    val vecD = col("embedding").cast("array<double>")
    val best = Similarity.centroidBestExpr(vecD, centroids)
    val stats = spark.readStream.schema(vecSchema).format("parquet").load(path)
      .select(best.getField("cid").as("centroid_id"), best.getField("d2").as("d2"))
      .groupBy(col("centroid_id"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("d2")), 4).as("mean_d2"),
        max(col("d2")).as("max_d2"))
    val q = stats.writeStream
      .outputMode(OutputMode.Complete())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Rounded cosine, arithmetic-identical to the batch expression:
    * `graft_dot` folds in index order (a plain loop), `round(x, 5)`
    * is HALF_UP.
    */
  private def cosine5(a: Array[Double], b: Array[Double]): Double = {
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { dab += a(i) * b(i); i += 1 }
    i = 0
    while (i < a.length) { daa += a(i) * a(i); i += 1 }
    i = 0
    while (i < b.length) { dbb += b(i) * b(i); i += 1 }
    val c = dab / (math.sqrt(daa) * math.sqrt(dbb))
    BigDecimal(c).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
