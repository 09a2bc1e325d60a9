package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Point-in-interval join — the variable-width band join Catalyst
  * plans as a per-key nested loop (`p.ts >= i.start AND p.ts <
  * i.end` is not an equi-condition). Complements
  * [[graft.plans.RangeJoinRule]], which rewrites the SYMMETRIC
  * fixed-width `abs(l − r) <= d` form as an optimizer rule; here the
  * width varies per interval, so the bucketing must explode the
  * interval side instead of the probe side.
  *
  * Plan shape (the 100 TB posture): each interval explodes to the
  * grid buckets it covers (`ceil(width / bucketSeconds) + 1` rows),
  * the join becomes an equi-join on (keys, bucket), and the exact
  * band predicate re-applies as a post-filter. A matched pair shares
  * exactly one bucket — the point's own — so no dedup pass is needed.
  * Pick `bucketSeconds` near the TYPICAL interval width: the explode
  * factor is width/bucket (interval side) while the candidate
  * false-positive rate grows with bucket/width (probe side).
  *
  * Semantics: half-open `[start, end)`; inverted or empty intervals
  * (`end <= start`) match nothing; a point inside k overlapping
  * intervals emits k rows (it is a join, not an as-of); null
  * timestamps on either side match nothing.
  */
object IntervalJoin {

  /** @param maxBucketsPerInterval hard ceiling on the per-interval
    *   explode (default 65536 buckets; `<= 0` disables the guard). An
    *   open-ended-sentinel interval (`end = 9999-12-31` at a 1-day
    *   bucket ≈ 3M buckets) would otherwise materialize a
    *   multi-million-element array PER ROW and OOM the executor.
    *   Intervals wider than the cap instead take a naive fallback
    *   branch: an equi-join on the keys with the band as a residual
    *   filter — wrapped in `graft_barrier` so the session-default
    *   [[graft.plans.IntervalJoinRule]] cannot re-explode the
    *   deliberate fallback. Wide intervals are the rare pathology;
    *   with AQE an empty wide slice collapses the branch at runtime.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      startCol: String,
      endCol: String,
      payload: Seq[String],
      bucketSeconds: Double,
      maxBucketsPerInterval: Long = 65536L
  ): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(keys.nonEmpty, "interval join needs at least one equi key")
    graft.functions.GraftFunctions.ensure(points.sparkSession)
    val rightCols = (Seq(startCol, endCol) ++ payload).distinct
    val collisions = rightCols.filter(points.columns.contains)
    require(collisions.isEmpty,
      s"interval columns ${collisions.mkString(",")} collide with point columns — alias them first")

    val valid = col(startCol).isNotNull && col(endCol).isNotNull &&
      col(endCol).cast("double") > col(startCol).cast("double")
    val span =
      floor(col(endCol).cast("double") / bucketSeconds).cast("long") -
        floor(col(startCol).cast("double") / bucketSeconds).cast("long")
    val band =
      col(pointTs).cast("double") >= col(startCol).cast("double") &&
        col(pointTs).cast("double") < col(endCol).cast("double")
    val outCols = points.columns.toSeq.map(col) ++ rightCols.map(col)

    // double epoch keeps sub-second precision (a long cast would
    // floor); timestamps and numerics both ride the same axis
    val p0 = points.filter(col(pointTs).isNotNull)
    val p = p0.withColumn("__b",
      floor(col(pointTs).cast("double") / bucketSeconds).cast("long"))
    val capped = maxBucketsPerInterval > 0
    val iv = intervals
      .filter(if (capped) valid && span <= maxBucketsPerInterval else valid)
      .withColumn("__b", explode(sequence(
        floor(col(startCol).cast("double") / bucketSeconds).cast("long"),
        // end is exclusive but its bucket can still hold points < end
        floor(col(endCol).cast("double") / bucketSeconds).cast("long"))))
      .select(keys.map(col) ++ (col("__b") +: rightCols.map(col)): _*)

    val narrow = p.join(iv, keys :+ "__b")
      .filter(band)
      .select(outCols: _*)
    if (!capped) return narrow

    val wideIv = intervals
      .filter(valid && span > maxBucketsPerInterval)
      .select(keys.map(col) ++ rightCols.map(col): _*)
    val wide = p0.join(broadcast(wideIv), keys)
      .filter(call_function("graft_barrier", band))
      .select(outCols: _*)
    narrow.unionByName(wide)
  }
}
