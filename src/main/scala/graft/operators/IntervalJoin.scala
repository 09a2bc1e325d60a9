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

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      startCol: String,
      endCol: String,
      payload: Seq[String],
      bucketSeconds: Double
  ): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(keys.nonEmpty, "interval join needs at least one equi key")
    val rightCols = (Seq(startCol, endCol) ++ payload).distinct
    val collisions = rightCols.filter(points.columns.contains)
    require(collisions.isEmpty,
      s"interval columns ${collisions.mkString(",")} collide with point columns — alias them first")

    // double epoch keeps sub-second precision (a long cast would
    // floor); timestamps and numerics both ride the same axis
    val p = points
      .filter(col(pointTs).isNotNull)
      .withColumn("__b",
        floor(col(pointTs).cast("double") / bucketSeconds).cast("long"))
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol).cast("double") > col(startCol).cast("double"))
      .withColumn("__b", explode(sequence(
        floor(col(startCol).cast("double") / bucketSeconds).cast("long"),
        // end is exclusive but its bucket can still hold points < end
        floor(col(endCol).cast("double") / bucketSeconds).cast("long"))))
      .select(keys.map(col) ++ (col("__b") +: rightCols.map(col)): _*)

    p.join(iv, keys :+ "__b")
      .filter(col(pointTs).cast("double") >= col(startCol).cast("double") &&
        col(pointTs).cast("double") < col(endCol).cast("double"))
      .select(points.columns.toSeq.map(col) ++ rightCols.map(col): _*)
  }
}
