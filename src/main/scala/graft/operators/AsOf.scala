package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Generic as-of join — the ordered time-series join Spark has no
  * native operator for (the reference's nearest-grid reindex,
  * `solardatatools/time_axis_manipulation.py` standardization, is the
  * gridded special case this generalizes; see q14/RangeJoinRule for
  * that path). For each left row, attach the payload of the LATEST
  * right row at-or-before it (`backward`, the default) or the
  * EARLIEST right row at-or-after it (`forward`) within the same
  * keys, optionally within a tolerance window.
  *
  * Plan shape (the 100 TB posture): the naive formulation is an
  * equi-key + range predicate — Catalyst plans that as a nested-loop
  * per key group, quadratic in group size. This implementation is the
  * union-window form: tag the two sides, shuffle ONCE on the keys,
  * and carry the last-seen right payload forward in a single ordered
  * window pass. Cost = one Exchange + one sort per side of the union;
  * no range explosion; skewed keys are AQE's problem, not a plan
  * pathology. Right rows that tie on (keys, ts) are collapsed
  * deterministically to the struct-max payload BEFORE the join, so
  * the result never depends on shuffle order.
  */
object AsOf {

  /** @param left       probe side; every row is preserved (left join)
    * @param right      build side supplying `payload`
    * @param keys       equi-join keys present on both sides
    * @param leftTs     left ordering column (timestamp or numeric)
    * @param rightTs    right ordering column (same family as leftTs)
    * @param payload    right columns to attach; names must not
    *                   collide with left columns (alias on the way in)
    * @param toleranceSeconds max |left ts − matched right ts| in
    *                   seconds (epoch-double arithmetic); matches
    *                   farther than this are nulled, the left row kept
    * @param direction  "backward" (latest right ≤ left, default) or
    *                   "forward" (earliest right ≥ left); equality is
    *                   a match in both
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSeconds: Option[Double] = None,
      direction: String = "backward"
  ): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(payload.nonEmpty, "payload must name at least one right column")
    val collisions = payload.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"payload columns ${collisions.mkString(",")} collide with left columns — alias them on the right frame first")
    require(keys.nonEmpty, "as-of join needs at least one equi key")

    // right side: one row per (keys, ts) — exact-tie right rows
    // collapse to the struct-max payload so the match is deterministic
    val rUnique = right
      .filter(col(rightTs).isNotNull)
      .groupBy((keys :+ rightTs).map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("__p"))
    val pType = rUnique.schema("__p").dataType

    // a common double ordering axis: epoch seconds for timestamps
    // (cast keeps the sub-second fraction; long cast would floor),
    // the value itself for numerics — negated for the forward
    // direction so ONE window form serves both
    def axis(c: String) = {
      val d = col(c).cast("double")
      if (direction == "backward") d else -d
    }

    val leftExtra = left.columns.filterNot(keys.contains).toSeq
    val lPart = left.select(
      keys.map(col) ++ leftExtra.map(col) ++ Seq(
        axis(leftTs).as("__ats"), lit(1).as("__side"),
        lit(null).cast(pType).as("__p")): _*)
    val rPart = rUnique.select(
      keys.map(col) ++ leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        axis(rightTs).as("__ats"), lit(0).as("__side"), col("__p")): _*)

    // right rows sort before left rows at the same instant (__side
    // 0 < 1), so an exact-timestamp right row is visible to its left
    // row — equality is a match. Left rows with a null ts sort first
    // (nulls-first default) and therefore match nothing, as they must.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lPart.unionByName(rPart)
      .withColumn("__lastp", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__lastts",
        last(when(col("__side") === 0, col("__ats")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // |Δt| in real seconds: the axis is ± epoch seconds, and the
    // carried right row is never on the far side of the direction,
    // so axis difference = |Δt| in both directions
    val gated = toleranceSeconds match {
      case Some(tol) =>
        carried.withColumn("__lastp",
          when(col("__ats") - col("__lastts") <= tol, col("__lastp")))
      case None => carried
    }
    gated.select(
      left.columns.toSeq.map(col) ++
        payload.map(p => col("__lastp").getField(p).as(p)): _*)
  }
}
