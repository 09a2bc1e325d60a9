package graft.analyses

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sensor identification — which candidate irradiance sensor best
  * predicts a system's power output (reference
  * `sensor_identification.py:49-124`): assume a linear model
  * power ≈ a + b·sensor, score each sensor by time-series
  * cross-validated RMSE under three day filters (no_errors / clear /
  * cloudy — clear days probe plane-of-array mismatch, cloudy days
  * probe distance-from-array), choose the per-filter argmin, and
  * flag when the filters disagree.
  *
  * Spark-first design — the reference refits sklearn models per
  * (sensor × filter × split); here the ENTIRE k-fold CV is algebra
  * over sufficient statistics, so the raw scan is touched exactly
  * once at any fleet size:
  *
  *  1. ONE day-grain aggregation computes per-(site, day, sensor)
  *     moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — per-row products are
  *     lifted to exact integer micros first (the q07 idiom), so the
  *     sums are order-free in any engine. Sensors unpivot AFTER the
  *     aggregate (the q38 explode-after-aggregate rule): the row-grain
  *     scan never explodes.
  *  2. Day flags (clear/cloudy) join at day grain; the reference's
  *     `TimeSeriesSplit(n_splits=k)` becomes `ntile(k+1)` over each
  *     (site, filter)'s day order.
  *  3. Train-side stats for test fold f are a cumulative-sum window
  *     over folds < f; the OLS normal equations, the test-fold
  *     residual sum of squares
  *     (Σy² + n·a² + b²Σx² − 2aΣy − 2bΣxy + 2abΣx) and the mean bias
  *     (Σy − n·a − b·Σx)/n all evaluate from the same moments — no
  *     second data pass, no model object, no driver loop.
  *
  * Everything is relational, so the composition is DuckDB-replayable
  * end to end (q84/q85 hash gates).
  */
object SensorId {

  /** Per-(site, sensor, filter) CV scores.
    *
    * @param sensorCols candidate sensor columns of `df` (each numeric,
    *   same row grain as the power column)
    * @param dayFlags optional (site, day, clear) day flags —
    *   [[ClearDay.detect]] output — enabling the clear/cloudy filters;
    *   without it only `no_errors` is scored
    * @param errorDayPredicate row predicate marking ERROR rows; a day
    *   containing any is excluded from the `no_errors` filter
    *   (the reference's daily no-error flag)
    * @param nSplits TimeSeriesSplit count k (k+1 ntile blocks; folds
    *   2..k+1 are test folds)
    * @return (site, sensor, filter, n_days, n_obs, corr, cv_rmse,
    *   cv_mbe) — corr on the full filtered set, cv_* pooled over the
    *   test folds, 6 dp
    */
  /** The day-grain sufficient-statistic table the CV runs on — one row
    * per (site, day, sensor) with exact integer-micro moments (x, y at
    * 1e6; the quadratic products at 1e4, bounding the long at ~1e13
    * for 1e4-magnitude inputs over 1e5-row days). Public (and consumed
    * by [[identify]]) so the STREAMING twin
    * ([[graft.streaming.EventStream.incrementalSensorMoments]]) can be
    * compared against the exact batch grain.
    *
    * @return (site, day, n, sy, syy, err, sensor, sx, sxx, sxy)
    */
  def dayMoments(
      df: DataFrame,
      site: String,
      tsCol: String,
      powerCol: String,
      sensorCols: Seq[String],
      errorDayPredicate: Column = lit(false)
  ): DataFrame = {
    require(sensorCols.nonEmpty, "need at least one candidate sensor column")
    def li(c: Column, s: Double): Column = round(c * lit(s), 0).cast("long")
    val y = col(powerCol).cast("double")
    val perDayAggs = Seq(
      count(y).cast("long").as("n"),
      sum(li(y, 1e6)).as("sy"),
      sum(li(y * y, 1e4)).as("syy"),
      max(when(errorDayPredicate, 1).otherwise(0)).as("err")
    ) ++ sensorCols.zipWithIndex.flatMap { case (sc, i) =>
      val x = col(sc).cast("double")
      Seq(
        sum(li(x, 1e6)).as(s"sx_$i"),
        sum(li(x * x, 1e4)).as(s"sxx_$i"),
        sum(li(x * y, 1e4)).as(s"sxy_$i"))
    }
    // a row with ANY null candidate drops for ALL sensors — the
    // reference's own semantics (`sensor_identification.py:42-44`:
    // compare_mask = alltrue over every extra matrix's non-NaN mask),
    // which also keeps the shared (n, Σy, Σy²) moments one aggregation
    val dayStats = df
      .filter(col(tsCol).isNotNull && y.isNotNull &&
        sensorCols.map(c => col(c).isNotNull).reduce(_ && _))
      .groupBy(col(site).as("site"), to_date(col(tsCol)).as("day"))
      .agg(perDayAggs.head, perDayAggs.tail: _*)
    // unpivot sensors at DAY grain (the scan never explodes)
    val stackExpr = sensorCols.zipWithIndex
      .map { case (sc, i) => s"'$sc', sx_$i, sxx_$i, sxy_$i" }
      .mkString(s"stack(${sensorCols.length}, ", ", ", ") AS (sensor, sx, sxx, sxy)")
    dayStats.select(
      col("site"), col("day"), col("n"), col("sy"), col("syy"), col("err"),
      expr(stackExpr))
  }

  /** [[dayMoments]] expanded by the day-filter axis (no_errors always;
    * clear/cloudy when day flags are provided) — the shared input
    * grain of both CV faces ([[identify]] and [[identifyHuber]]).
    */
  private def filteredMoments(
      df: DataFrame,
      site: String,
      tsCol: String,
      powerCol: String,
      sensorCols: Seq[String],
      dayFlags: Option[DataFrame],
      errorDayPredicate: Column
  ): DataFrame = {
    val long0 = dayMoments(df, site, tsCol, powerCol, sensorCols, errorDayPredicate)
    dayFlags match {
      case None =>
        long0.filter(col("err") === 0).withColumn("filter", lit("no_errors"))
      case Some(flags) =>
        val fl = flags.select(
          col("site"), col("day").cast("date").as("day"),
          col("clear").cast("boolean").as("clear"))
        val j = long0.join(fl, Seq("site", "day"), "left")
          .withColumn("clear", coalesce(col("clear"), lit(false)))
        j.withColumn("filter",
            explode(array(lit("no_errors"), lit("clear"), lit("cloudy"))))
          .filter(
            (col("filter") === "no_errors" && col("err") === 0) ||
              (col("filter") === "clear" && col("clear")) ||
              (col("filter") === "cloudy" && !col("clear")))
    }
  }

  def identify(
      df: DataFrame,
      site: String,
      tsCol: String,
      powerCol: String,
      sensorCols: Seq[String],
      dayFlags: Option[DataFrame] = None,
      errorDayPredicate: Column = lit(false),
      nSplits: Int = 20
  ): DataFrame = {
    require(nSplits >= 2, s"nSplits must be >= 2, got $nSplits")
    val longF = filteredMoments(df, site, tsCol, powerCol, sensorCols,
      dayFlags, errorDayPredicate)
    // TimeSeriesSplit: k+1 ordered blocks of the filtered day axis
    val wDay = Window.partitionBy(col("site"), col("sensor"), col("filter"))
      .orderBy(col("day"))
    val folds = longF
      .withColumn("fold", ntile(nSplits + 1).over(wDay))
      .groupBy(col("site"), col("sensor"), col("filter"), col("fold"))
      .agg(
        count(lit(1)).as("f_days"),
        sum(col("n")).as("n"), sum(col("sx")).as("sx"), sum(col("sy")).as("sy"),
        sum(col("sxy")).as("sxy"), sum(col("sxx")).as("sxx"), sum(col("syy")).as("syy"))
    val wCum = Window.partitionBy(col("site"), col("sensor"), col("filter"))
      .orderBy(col("fold")).rowsBetween(Window.unboundedPreceding, -1)
    def d6(c: Column): Column = c.cast("double") / 1e6
    def d4(c: Column): Column = c.cast("double") / 1e4
    val scored = folds
      .withColumn("tn", sum(col("n")).over(wCum))
      .withColumn("tsx", d6(sum(col("sx")).over(wCum)))
      .withColumn("tsy", d6(sum(col("sy")).over(wCum)))
      .withColumn("tsxy", d4(sum(col("sxy")).over(wCum)))
      .withColumn("tsxx", d4(sum(col("sxx")).over(wCum)))
      // train OLS with intercept: b = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²),
      // a = (Σy − bΣx)/n; a degenerate train split (constant sensor)
      // yields null, which poisons that fold's rmse to null — the
      // reference appends inf residuals there, same verdict
      .withColumn("b", try_divide(
        col("tn") * col("tsxy") - col("tsx") * col("tsy"),
        col("tn") * col("tsxx") - col("tsx") * col("tsx")))
      .withColumn("a", try_divide(col("tsy") - col("b") * col("tsx"), col("tn")))
      // test-fold residual moments from the fold's own sums — lifted
      // back to exact integers (1e-4 absolute quantization on RSS)
      // so the cross-fold pooling below is order-free in any engine
      .withColumn("rss",
        when(col("fold") === 1, lit(null)).otherwise(
          round((d4(col("syy")) + col("n") * col("a") * col("a") +
            col("b") * col("b") * d4(col("sxx")) -
            lit(2.0) * col("a") * d6(col("sy")) -
            lit(2.0) * col("b") * d4(col("sxy")) +
            lit(2.0) * col("a") * col("b") * d6(col("sx"))) * lit(1e4), 0).cast("long")))
      .withColumn("sres",
        when(col("fold") === 1, lit(null)).otherwise(
          round((d6(col("sy")) - col("n") * col("a") - col("b") * d6(col("sx"))) * lit(1e6), 0)
            .cast("long")))
    scored
      .groupBy(col("site"), col("sensor"), col("filter"))
      .agg(
        sum(col("f_days")).as("n_days"),
        sum(col("n")).as("n_obs"),
        // full-set Pearson corr from the same exact moments; explicit
        // positive-variance guard — a degenerate (constant) series
        // must yield null, never sqrt of a quantization-negative
        {
          val varx = sum(col("n")) * d4(sum(col("sxx"))) -
            d6(sum(col("sx"))) * d6(sum(col("sx")))
          val vary = sum(col("n")) * d4(sum(col("syy"))) -
            d6(sum(col("sy"))) * d6(sum(col("sy")))
          val cov = sum(col("n")) * d4(sum(col("sxy"))) -
            d6(sum(col("sx"))) * d6(sum(col("sy")))
          when(varx > 0.0 && vary > 0.0,
            round(cov / sqrt(varx * vary) * lit(1e6)) / lit(1e6)).as("corr")
        },
        // a sensor with NO test folds, or with ANY degenerate
        // (constant-series) train fold, is DISQUALIFIED for this
        // filter: the reference appends inf residuals on a failed fit
        // (`sensor_identification.py:100-103`), making its CV RMSE
        // infinite — a null score (sorted last by [[choose]]) is the
        // cross-engine analog. Silently pooling only the healthy folds
        // would let a partially-dead sensor win the argmin.
        {
          val nTest = sum(when(col("fold") > 1, 1L).otherwise(0L))
          val nGood = sum(when(col("rss").isNotNull, 1L).otherwise(0L))
          when(nTest === 0 || nTest =!= nGood, lit(null)).otherwise(
            (round(sqrt(greatest(
              try_divide(d4(sum(col("rss"))), sum(when(col("rss").isNotNull, col("n")))),
              lit(0.0))) * lit(1e6)) / lit(1e6))).as("cv_rmse")
        },
        {
          val nTest = sum(when(col("fold") > 1, 1L).otherwise(0L))
          val nGood = sum(when(col("sres").isNotNull, 1L).otherwise(0L))
          when(nTest === 0 || nTest =!= nGood, lit(null)).otherwise(
            (round(try_divide(d6(sum(col("sres"))), sum(when(col("sres").isNotNull, col("n")))) * lit(1e6)) / lit(1e6)))
            .as("cv_mbe")
        })
  }

  /** The reference's `model="huber"` option
    * (`sensor_identification.py:60-61`: sklearn HuberRegressor,
    * ε = 1.35) at fleet scale. sklearn's row-level Huber has no
    * one-pass sufficient statistic (each row's loss branch depends on
    * its own residual), so this face robustifies at the DAY grain —
    * the natural anomaly unit for sensor selection: an IRLS where
    * each day's weight is min(1, ε·σ / rms_d), rms_d its RMS residual
    * derived EXACTLY from the day's moment block, and each iteration
    * refits weighted OLS over the weighted moment sums. σ starts at
    * the train split's OLS RMSE and re-estimates each iteration from
    * WINSORIZED residuals — Huber's Proposal-2 shape, the joint-scale
    * behavior sklearn's HuberRegressor has; a fixed contaminated
    * scale would cap the downweighting. State
    * per (site, sensor, filter) task is the day-moment rows —
    * day-count-bounded like every other solver stage; the raw scan is
    * still touched exactly once ([[dayMoments]]).
    *
    * Same CV protocol, disqualification semantics (a degenerate train
    * split nulls the whole score — the reference's inf residuals),
    * and output schema as [[identify]].
    */
  def identifyHuber(
      df: DataFrame,
      site: String,
      tsCol: String,
      powerCol: String,
      sensorCols: Seq[String],
      dayFlags: Option[DataFrame] = None,
      errorDayPredicate: Column = lit(false),
      nSplits: Int = 20,
      epsilon: Double = 1.35,
      iters: Int = 30
  ): DataFrame = {
    require(nSplits >= 2, s"nSplits must be >= 2, got $nSplits")
    val spark = df.sparkSession
    import spark.implicits._
    val longF0 = filteredMoments(df, site, tsCol, powerCol, sensorCols,
      dayFlags, errorDayPredicate)
    // site keys round-trip through their STRING form so any site type
    // works (identify preserves the input type; a long cast here would
    // null out string ids and crash the tuple encoder)
    val siteType = longF0.schema("site").dataType
    val longF = longF0
      .select(col("site").cast("string"), col("sensor"), col("filter"),
        col("day").cast("string"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("sxy"), col("syy"))
      .as[(String, String, String, String, Long, Long, Long, Long, Long, Long)]
    longF
      .groupByKey(r => (r._1, r._2, r._3))
      .mapGroups { (key: (String, String, String),
                    it: Iterator[(String, String, String, String, Long, Long, Long, Long, Long, Long)]) =>
        val days = it.toArray.sortBy(_._4)
        val m = days.map(d => DayMoment(d._5, d._6 / 1e6, d._7 / 1e6,
          d._8 / 1e4, d._9 / 1e4, d._10 / 1e4))
        // ntile(nSplits+1) over the day order — identical block sizes
        // to the relational face's folds (SQL ntile: the first nD mod k
        // buckets take the ceiling size)
        val k = nSplits + 1
        val nD = m.length
        val q = nD / k
        val r = nD % k
        val bounds = (0 to k).map(f => f * q + math.min(f, r))
        var pooledRss = 0.0
        var pooledRes = 0.0
        var pooledN = 0L
        var nTest = 0
        var nGood = 0
        var f = 2
        while (f <= k) {
          val train = m.slice(bounds(0), bounds(f - 1))
          val test = m.slice(bounds(f - 1), bounds(f))
          if (test.nonEmpty) {
            nTest += 1
            huberFitMoments(train, epsilon, iters).foreach { case (a, b) =>
              nGood += 1
              test.foreach { d =>
                pooledRss += math.max(rssDay(d, a, b), 0.0)
                pooledRes += d.sy - d.n * a - b * d.sx
                pooledN += d.n
              }
            }
          }
          f += 1
        }
        // totals accumulate the EXACT integer moments (order-free) and
        // divide once — the form a SQL replay reproduces bit-for-bit
        var tn = 0L; var tsx = 0L; var tsy = 0L; var tsxx = 0L; var tsxy = 0L; var tsyy = 0L
        days.foreach { d =>
          tn += d._5; tsx += d._6; tsy += d._7; tsxx += d._8; tsxy += d._9; tsyy += d._10
        }
        val varx = tn * (tsxx / 1e4) - (tsx / 1e6) * (tsx / 1e6)
        val vary = tn * (tsyy / 1e4) - (tsy / 1e6) * (tsy / 1e6)
        val cov = tn * (tsxy / 1e4) - (tsx / 1e6) * (tsy / 1e6)
        val corr =
          if (varx > 0.0 && vary > 0.0) Some(rd6(cov / math.sqrt(varx * vary))) else None
        val ok = nTest > 0 && nTest == nGood && pooledN > 0
        (key._1, key._2, key._3, days.length.toLong, tn, corr,
          if (ok) Some(rd6(math.sqrt(math.max(pooledRss / pooledN, 0.0)))) else None,
          if (ok) Some(rd6(pooledRes / pooledN)) else None)
      }
      .toDF("site", "sensor", "filter", "n_days", "n_obs", "corr", "cv_rmse", "cv_mbe")
      .withColumn("site", col("site").cast(siteType))
  }

  private case class DayMoment(n: Long, sx: Double, sy: Double,
      sxx: Double, sxy: Double, syy: Double)

  /** Engine-portable 6-dp quantizer: round-half-away-from-zero on the
    * explicitly computed product x*1e6 — the semantics of BOTH Spark's
    * `round(col * 1e6)` and DuckDB's `round(x * 1e6)` on the identical
    * double, unlike a decimal-scale round (the q64 bug class: a
    * string-based decimal round diverges from a scaled-product one on
    * 7th-decimal-half shortest reprs, which the dyadic q90 fixture
    * produces).
    */
  private def rd6(x: Double): Double = {
    val p = x * 1e6
    val fl = math.floor(math.abs(p))
    val r = if (math.abs(p) - fl >= 0.5) fl + 1.0 else fl
    math.copySign(r, p) / 1e6
  }

  /** A day's residual sum of squares at (a, b), exactly from its
    * moment block: Σ(y − a − bx)² = Σy² + n·a² + b²Σx² − 2aΣy − 2bΣxy
    * + 2abΣx.
    */
  private def rssDay(d: DayMoment, a: Double, b: Double): Double =
    d.syy + d.n * a * a + b * b * d.sxx -
      2.0 * a * d.sy - 2.0 * b * d.sxy + 2.0 * a * b * d.sx

  /** Day-grain Huber IRLS over moment blocks (see [[identifyHuber]]):
    * OLS init sets (a, b) and σ; each iteration weights every day
    * min(1, ε·σ/rms_d), refits weighted OLS on the weighted sums, and
    * re-estimates σ from the weighted residuals at the new fit —
    * folding days in the fixed day order. Returns None on a
    * degenerate split (zero sensor variance), matching the relational
    * face's disqualification.
    */
  private[graft] def huberFitMoments(
      train: Array[DayMoment],
      epsilon: Double,
      iters: Int
  ): Option[(Double, Double)] = {
    if (train.isEmpty) return None
    var n = 0.0; var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0; var syy = 0.0
    train.foreach { d =>
      n += d.n; sx += d.sx; sy += d.sy; sxx += d.sxx; sxy += d.sxy; syy += d.syy
    }
    val den0 = n * sxx - sx * sx
    if (!(den0 > 0.0)) return None
    var b = (n * sxy - sx * sy) / den0
    var a = (sy - b * sx) / n
    var rss0 = 0.0
    train.foreach(d => rss0 += math.max(rssDay(d, a, b), 0.0))
    // the scale RE-ESTIMATES each iteration from WINSORIZED residuals
    // (Huber's Proposal-2 shape): a fixed OLS scale is inflated by the
    // very outliers the loss exists to resist, and an unwinsorized
    // update lets a gross day keep the scale inflated through its own
    // w·rss term — truncating each day's rms at the cut removes both,
    // so a single gross train day is recovered EXACTLY (spec pins it)
    var cut = epsilon * math.sqrt(math.max(rss0 / n, 1e-12))
    var itn = 0
    while (itn < iters) {
      var wn = 0.0; var wsx = 0.0; var wsy = 0.0; var wsxx = 0.0; var wsxy = 0.0
      var i = 0
      while (i < train.length) {
        val d = train(i)
        val rms = math.sqrt(math.max(rssDay(d, a, b), 0.0) / d.n)
        val wi = if (rms <= cut) 1.0 else cut / rms
        wn += wi * d.n; wsx += wi * d.sx; wsy += wi * d.sy
        wsxx += wi * d.sxx; wsxy += wi * d.sxy
        i += 1
      }
      val den = wn * wsxx - wsx * wsx
      if (den > 0.0) {
        b = (wn * wsxy - wsx * wsy) / den
        a = (wsy - b * wsx) / wn
      }
      var swin = 0.0
      i = 0
      while (i < train.length) {
        val d = train(i)
        val rms = math.sqrt(math.max(rssDay(d, a, b), 0.0) / d.n)
        val t = math.min(rms, cut)
        swin += d.n * t * t
        i += 1
      }
      cut = epsilon * math.sqrt(math.max(swin / n, 1e-12))
      itn += 1
    }
    Some((a, b))
  }

  /** Per-site verdict over an [[identify]] results table: the
    * per-filter argmin-RMSE sensor (ties → lexicographic sensor name,
    * nulls last), whether all filters agree, and the chosen sensor
    * when they do (the reference returns a per-filter dict otherwise;
    * here the per-filter picks are columns and `chosen_sensor` is
    * null on disagreement).
    */
  def choose(results: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("site"), col("filter"))
      .orderBy(col("cv_rmse").asc_nulls_last, col("sensor").asc)
    val best = results
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col("site"))
      .pivot("filter", Seq("no_errors", "clear", "cloudy"))
      .agg(first(col("sensor")))
      .withColumnRenamed("no_errors", "choice_no_errors")
      .withColumnRenamed("clear", "choice_clear")
      .withColumnRenamed("cloudy", "choice_cloudy")
    val filters = Seq("choice_no_errors", "choice_clear", "choice_cloudy")
    val present = filters.map(f => when(col(f).isNotNull, col(f)))
    best
      .withColumn("consistent",
        coalesce(size(array_distinct(array_compact(array(present: _*)))) === 1, lit(false)))
      .withColumn("chosen_sensor",
        when(col("consistent"), coalesce(filters.map(col): _*)))
      .select(col("site"), col("chosen_sensor"), col("consistent"),
        col("choice_no_errors"), col("choice_clear"), col("choice_cloudy"))
  }
}
