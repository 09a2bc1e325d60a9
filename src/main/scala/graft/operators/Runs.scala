package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Ordered/segmentation operators: gaps-and-islands run detection,
  * sessionization, IQR outlier bounds, empirical CDF.
  *
  * Reference: `solardatatools/utilities.py:53-80` (`find_runs`),
  * `utilities.py:12-31` (IQR filter), `algorithms/clipping.py:360-370`
  * (ECDF resample). All window/groupBy plans — one shuffle each.
  */
object Runs {

  /** Gaps-and-islands: assign a run id (1-based per key) to maximal
    * runs of equal `valueCol`, ordered by `(orderCol, tieBreak...)` —
    * pass a tie-break when order values can repeat, or the assignment
    * is shuffle-order-dependent. Null-safe: a null value is a run
    * value like any other (`lag <=> value` change detection; the
    * first row starts run 1 explicitly, since a lag-null <=> null
    * comparison would otherwise read as "no change").
    */
  def withRunId(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      valueCol: String,
      tieBreak: Seq[String] = Seq.empty
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy((orderCol +: tieBreak).map(col): _*)
    val changed = when(row_number().over(w) === 1, 1)
      .when(!(lag(col(valueCol), 1).over(w) <=> col(valueCol)), 1)
      .otherwise(0)
    df.withColumn("__chg", changed)
      .withColumn("run_id", sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__chg")
  }

  /** Sessionize: new session when the gap to the previous event
    * exceeds `gapS` seconds. Adds `session_id` (1-based per key).
    * As with [[withRunId]], pass `tieBreak` when timestamps repeat.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapS: Long,
      tieBreak: Seq[String] = Seq.empty
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy((tsCol +: tieBreak).map(col): _*)
    val e = TimeAxis.epochS(col(tsCol))
    val newSession = when(
      lag(e, 1).over(w).isNull || (e - lag(e, 1).over(w)) > gapS,
      1
    ).otherwise(0)
    df.withColumn("__new", newSession)
      .withColumn("session_id", sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Per-key IQR bounds: (keys..., q1, q3, lo, hi) with
    * lo/hi = q1/q3 ∓ k·IQR (reference `utilities.py:12-31`).
    * Exact percentiles by default; bounds rounded to 6 dp so the same
    * predicate evaluates identically in any engine doing the
    * comparison. The exact path is the self-routing
    * [[Percentiles.exact]] (round 12): bit-identical to the
    * `percentile` aggregate with bounded spill-able state, which
    * retires the unbounded distinct-value buffer this operator used
    * to carry; scan-shaped inputs take the near-shuffle-free
    * histogram route, derived inputs the single-evaluation sort route.
    * `exact = false` keeps the GK sketch (`approx_percentile`, rank
    * error ≤ 1e-4) for callers preferring a single-pass plan.
    *
    * All-null-group contract (round 11 change): with `exact = true`,
    * a key group whose values are ALL null is ABSENT from the output
    * — the old `percentile` aggregate emitted it with null q1/q3/lo/hi
    * (as `exact = false` still does). In-repo call sites filter nulls
    * upstream or inner-join this result, where absent and null
    * coincide; an external caller LEFT-joining on these keys sees the
    * group disappear rather than join null — restore null rows with
    * `keysDf.join(iqrBounds(...), keys, "left")` from a distinct-keys
    * frame if that distinction matters.
    */
  def iqrBounds(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      k: Double,
      exact: Boolean = true
  ): DataFrame =
    (if (exact)
      Percentiles.exact(df, keys, valueCol, Seq(0.25 -> "q1", 0.75 -> "q3"))
    else
      df.groupBy(keys.map(col): _*)
        .agg(
          approx_percentile(col(valueCol), lit(0.25), lit(10000)).as("q1"),
          approx_percentile(col(valueCol), lit(0.75), lit(10000)).as("q3")))
      // product quantizer, not round(x, 6): interpolated percentiles
      // hit decimal-half shortest reprs where engines' decimal rounds
      // disagree (the q64 class — see Study.scaleParams)
      .withColumn("lo",
        round((col("q1") - lit(k) * (col("q3") - col("q1"))) * lit(1e6)) / lit(1e6))
      .withColumn("hi",
        round((col("q3") + lit(k) * (col("q3") - col("q1"))) * lit(1e6)) / lit(1e6))

  /** Empirical CDF position of `valueCol` within each key group
    * (reference `clipping.py:360-370`): `percent_rank` over the sorted
    * stat, tie-broken by `tieBreak` for determinism.
    */
  def ecdf(df: DataFrame, keys: Seq[String], valueCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol).asc, col(tieBreak).asc)
    df.withColumn("ecdf", percent_rank().over(w))
  }
}
