package graft.analyses

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.Solar
import graft.operators.{Filling, TimeAxis}

/** Config-sweep study harnesses (reference
  * `pvsystemprofiler/latitude_study.py:29-256` and
  * `longitude_study.py:31-225`): evaluate the cross product of
  * estimation configurations — input matrix × per-day estimation
  * method × astronomical equation × day selection — and report one
  * estimate row per (site, config), optionally with residuals against
  * ground truth ([[withResidual]]).
  *
  * Spark-first shape (the q38/q55 grid-as-columns idiom): every config
  * axis is a COLUMN variant, not a job. Per-day quantities for every
  * daylight / solar-noon method land in ONE day-grain aggregation of
  * the raw scan; day-selection masks select via `when(...)` inside the
  * site-grain median aggregates (`percentile` skips nulls, matching
  * the reference's `nanmedian`); and the config cross-product is
  * unpivoted only AFTER aggregation. The scan is never multiplied by
  * the config count — adding a config adds a column, not a pass. The
  * reference's nested Python loop (`latitude_study.py:158-192`)
  * re-slices the in-RAM matrix per config; at 100 TB that loop
  * becomes one shuffle at (site, day) grain plus a site-grain stack.
  *
  * Day-selection semantics: `all` = every observed day (the
  * reference's `no_errors` flag analog on cleaned input), `clear` =
  * [[ClearDay.detect]]'s verdict, `cloudy` = its complement
  * (`daily_flags.cloudy`, `data_handler.py` daily flags).
  */
object Study {

  // explicit double constants, NOT radians()/degrees(): Spark's
  // radians() is Math.toRadians (x/180·π) while SQL oracles multiply
  // by the literal π/180 double — a last-ulp difference that can move
  // a median pair. The q37 contract: both engines multiply the same
  // literal.
  private val DegToRad = 0.017453292519943295
  private val RadToDeg = 57.29577951308232

  /** Per-day latitude inversion — Duffie eq. (1.6.11), the same
    * arithmetic as `algorithms/latitude/calculation.py:14-30`:
    * lat = atan(−cos(7.5°·H) / tan(δ)) with H in hours, δ in degrees.
    */
  private def latDay(daylightH: Column, deltaDeg: Column): Column =
    atan(-cos(lit(7.5) * daylightH * lit(DegToRad)) / tan(deltaDeg * lit(DegToRad))) * lit(RadToDeg)

  /** Per-day longitude — Duffie eq. (1.5.2) as
    * `algorithms/longitude/calculation.py:19-38`: lon = (720 − 60·SN −
    * EoT)/4 + 15·gmtOffset, SN = solar noon in hours, EoT in minutes.
    */
  private def lonDay(noonH: Column, eotMin: Column, gmtOffsetHours: Double): Column =
    (lit(720.0) - lit(60.0) * noonH - eotMin) / lit(4.0) + lit(15.0 * gmtOffsetHours)

  /** Standardized day-grain study input: one row per (site, day) with
    * every per-day method estimate as a column.
    *
    * Both matrices normalize to (site, day, h, v, freq_h) row grain:
    * `raw` is the cleaned event scan (h = local hour-of-day, freq from
    * the modal-Δt inference, the q06 contract); `filled` is
    * [[Filling.filledDayGrid]]'s slot grid (h = slot·24/slots, freq =
    * the grid pitch). Per-day columns:
    *
    *  - `dl_ss`: sunrise-sunset daylight — `detect_sun` scaling
    *    ((v−lo)/hi on the p99 scale, `daytime.py:41-54`) at
    *    `threshold`, first/last above-threshold hour with
    *    `rise_set_rough`'s boundary-null rule
    *    (`sunrise_sunset.py:11-27`: an argmax at the day's first/last
    *    sample means the true rise/set fell outside the observed
    *    window → null, and the day drops from that config's median);
    *  - `dl_raw`: raw daylight — `find_daytime` scaling ((v−p05)/
    *    (p95−p05), `daytime.py:11-38`) at `threshold`, above-threshold
    *    sample count × sampling hours
    *    (`latitude/hours_daylight.py:6-8`);
    *  - `noon_com`: energy center of mass (`solar_noon.py:20-40`);
    *  - `noon_rs`: rise/set average at threshold 0.01
    *    (`solar_noon.py:40-50`), null if either side is boundary-null.
    *
    * Scaled values are compared on the 6-dp HALF_UP grid (the
    * q55/ClearDay cross-engine contract) so threshold selections are
    * bit-identical in any engine.
    */
  def dayGrain(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      threshold: Double = 0.001,
      includeFilled: Boolean = true,
      filledSlotsPerDay: Int = 96,
      includeRaw: Boolean = true
  ): DataFrame =
    perDay(
      studyRows(spark, df, site, tsCol, valueCol, includeFilled, filledSlotsPerDay, includeRaw),
      threshold)

  /** The standardized (site, data_matrix, day, sec, v, freq_h) row
    * grain both studies aggregate — public so the q64-chain stage
    * gates (scale percentiles, day grain) can address it directly.
    */
  def studyRows(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      includeFilled: Boolean = true,
      filledSlotsPerDay: Int = 96,
      includeRaw: Boolean = true
  ): DataFrame = {
    require(includeRaw || includeFilled, "at least one data matrix must be enabled")
    val ev = df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
    // each matrix is priced only when requested: the raw path carries
    // a per-site modal-Δt window over the full scan that a
    // filled-only sweep (the q64/q65 gates) should never pay
    val rawRows: Option[DataFrame] =
      if (!includeRaw) None
      else {
        val raw = ev.select(
          col(site).cast("long").as("site"),
          to_date(col(tsCol)).as("day"),
          TimeAxis.secondsOfDay(col(tsCol)).cast("double").as("sec"),
          col(valueCol).cast("double").as("v"))
        val rawFreq = TimeAxis.inferFrequency(ev, Seq(site), tsCol)
          .select(col(site).cast("long").as("site"), (col("freq_s") / lit(3600.0)).as("freq_h"))
        // NO repartition here, unlike the filled branch: perDay does
        // consume these rows twice, but re-scanning parquet (pushdown,
        // columnar) is cheaper than an extra full shuffle — measured
        // at sf0.1 (q61 2.41 → 2.73 s with the shuffle). The filled
        // branch differs because its second execution re-runs a whole
        // derived pipeline, not a scan.
        Some(joinFreq(raw, rawFreq).withColumn("data_matrix", lit("raw")))
      }
    val filledRows: Option[DataFrame] =
      if (!includeFilled) None
      else Some(
        // the day-grain pass consumes these rows twice (scale
        // percentiles + the main aggregation). A site-keyed
        // repartition here gives both consumers ONE shared Exchange —
        // Spark's exchange reuse materializes the grid pipeline once
        // in shuffle files. Measured at sf0.1: beats both re-running
        // the pipeline tail twice and an .rdd/df persist (the shuffle
        // write is columnar; the Row-encoder cache boundary is not).
        Filling.filledDayGrid(ev, site, tsCol, valueCol, filledSlotsPerDay)
          .select(
            col("site").cast("long").as("site"), col("day"),
            (col("slot") * lit((86400 / filledSlotsPerDay).toDouble)).as("sec"),
            col("filled").as("v"),
            lit(24.0 / filledSlotsPerDay).as("freq_h"))
          .withColumn("data_matrix", lit("filled"))
          .repartition(col("site")))
    (rawRows, filledRows) match {
      case (Some(r), Some(f)) => r.unionByName(f)
      case (Some(r), None) => r
      case (None, Some(f)) => f
      case (None, None) => throw new IllegalStateException("unreachable")
    }
  }

  /** The site×matrix-grain scale parameters both daytime detections
    * use — detect_sun's (hi99, lo99) and find_daytime's (p95, bot) —
    * public as a stage gate of the study chain (the q64-flake
    * diagnosability split: a driver failure should name its stage).
    *
    * Published on the 6-dp grid: a percentile is an INTERPOLATED
    * value, and two engines (or two versions of one engine) may order
    * the interpolation's IEEE ops differently — `lo + frac·(hi−lo)`
    * vs `lo·(1−frac) + hi·frac` differ in the last ulp. Downstream
    * threshold selections divide by these params, so an unrounded ulp
    * is a cross-engine flake channel; quantizing here confines the
    * risk to an exact 6-dp boundary (and q88 gates the quantized
    * values directly, so a residual divergence names this stage).
    *
    * The quantizer is `round(x·1e6)/1e6`, NOT `round(x, 6)`: a scale-0
    * round of an explicitly computed product is engine-portable (both
    * engines see the identical correctly-rounded double, and for
    * |x·1e6| < 2^52 every half is exactly representable, so shortest-
    * repr and binary rounding agree), whereas a decimal-scale round
    * diverges between a string-based implementation (JVM BigDecimal
    * rounds the shortest decimal repr) and a scaled-product one
    * (C `round(x·1e6)/1e6`) whenever x's shortest repr terminates in a
    * 7th-decimal 5 — which the filled grid's dyadic interpolated
    * values hit systematically (the round-9 q64 driver-flake class).
    */
  def scaleParams(rows: DataFrame): DataFrame =
    // self-routing exact percentiles: all four levels (min rides as
    // the 0.0 level) in one call — the input is the DERIVED
    // filled/raw matrix pipeline, which [[Percentiles.exact]] routes
    // to the single-evaluation sort form (the histogram form's
    // second pass re-derived the grid: measured +1.5 s on q61, round
    // 11); when the grid is persisted (`spark.graft.filledGrid
    // .cache`) the cached leaf routes to histogram instead.
    // Bit-identical either way (PercentilesSpec), so the q88 gate and
    // every downstream threshold see the same values
    graft.operators.Percentiles.exact(
        rows, Seq("site", "data_matrix"), "v",
        Seq(0.99 -> "hi99", 0.0 -> "mn", 0.95 -> "p95", 0.05 -> "p05"))
      .withColumn("lo99", greatest(col("mn"), lit(-0.005) * col("hi99")))
      .withColumn("bot", greatest(col("p05"), lit(0.0)))
      .select(col("site"), col("data_matrix"),
        (round(col("hi99") * lit(1e6)) / lit(1e6)).as("hi99"),
        (round(col("lo99") * lit(1e6)) / lit(1e6)).as("lo99"),
        (round(col("p95") * lit(1e6)) / lit(1e6)).as("p95"),
        (round(col("bot") * lit(1e6)) / lit(1e6)).as("bot"))

  /** Broadcast the one-row-per-site frequency onto the scan. */
  private def joinFreq(rows: DataFrame, freq: DataFrame): DataFrame =
    rows.join(broadcast(freq), Seq("site"))

  private def perDay(rows: DataFrame, threshold: Double): DataFrame = {
    // site×matrix-grain scale parameters: detect_sun's (p99, lo) and
    // find_daytime's (p05, p95) — one aggregation, broadcast back
    val scale = scaleParams(rows)
    val h = col("sec") / lit(3600.0)
    // Threshold selections compare EXACT INTEGER MICROS, not a
    // 6-dp-rounded double: round(q·1e6) as a long is the same two IEEE
    // ops in any engine (one divide, one multiply) followed by an
    // integer round, whereas a 6-dp decimal round leaves a double
    // sitting at a comparison boundary where the engines' decimal
    // algorithms (Java BigDecimal setScale vs C libm scaling) can
    // disagree by one ulp — the q64 flake class. The threshold itself
    // is lifted to the same grid (0.001 → 1000).
    // Degenerate-scale guard: a near-zero-signal site can round hi99
    // to exactly 0 (or p95 to bot), turning the division into ±Inf —
    // which Spark would CAST to Long.MaxValue while DuckDB's CAST
    // raises, converting a value divergence into an oracle-side error.
    // Nullify instead (identically in the oracle CTEs): every sc_d/sc_r
    // comparison is then null → the day contributes no crossings.
    val j = rows.join(broadcast(scale), Seq("site", "data_matrix"))
      .withColumn("sc_d",
        when(col("hi99") =!= 0.0,
          round((col("v") - col("lo99")) / col("hi99") * lit(1e6), 0).cast("long")))
      .withColumn("sc_r",
        when(col("p95") =!= col("bot"),
          round((col("v") - col("bot")) / (col("p95") - col("bot")) * lit(1e6), 0).cast("long")))
    val thr = lit(math.round(threshold * 1e6))
    val d = j.groupBy(col("site"), col("data_matrix"), col("day"))
      .agg(
        min(when(col("sc_d") > thr, h)).as("sr"),
        max(when(col("sc_d") > thr, h)).as("ss"),
        min(when(col("sc_d") > lit(10000L), h)).as("sr01"),
        max(when(col("sc_d") > lit(10000L), h)).as("ss01"),
        min(h).as("h_first"),
        max(h).as("h_last"),
        sum(when(col("sc_r") >= thr, 1L).otherwise(0L)).as("n_daytime"),
        // CoM sums as EXACT INTEGERS end to end: v lifted to 6-dp
        // micros via a scale-0 round of the explicit product (engine-
        // portable — see [[scaleParams]]; `round(v, 6)` is NOT, and was
        // the round-9 q64 flake's root cause), then multiplied by the
        // integer second-of-day. Integer sums are exact and order-free
        // in ANY engine; num_c ≤ 86400·vmax·1e6·rows/day stays far
        // inside int64 even at minute grain over a year.
        sum(col("sec").cast("long") *
          round(col("v") * lit(1e6)).cast("long")).as("num_c"),
        sum(round(col("v") * lit(1e6)).cast("long")).as("sum_c"),
        first(col("freq_h")).as("freq_h"))
    val bounded = (sr: Column, ss: Column) =>
      when(sr === col("h_first") || ss === col("h_last"), lit(null)).otherwise(ss - sr)
    d
      .withColumn("dl_ss", bounded(col("sr"), col("ss")))
      .withColumn("dl_raw", col("n_daytime") * col("freq_h"))
      .withColumn("noon_com",
        try_divide(col("num_c") / lit(3600.0), col("sum_c")))
      .withColumn("noon_rs",
        when(col("sr01") === col("h_first") || col("ss01") === col("h_last"), lit(null))
          .otherwise((col("sr01") + col("ss01")) / 2.0))
      .withColumn("doy", dayofyear(col("day")))
  }

  /** Attach the clear/cloudy day flags ([[ClearDay.detect]] on the RAW
    * events — the reference computes `daily_flags` once on the
    * standardized data, before any per-config slicing).
    */
  private def withFlags(
      spark: SparkSession,
      day: DataFrame,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      clearSlotsPerDay: Int
  ): DataFrame = {
    val flags = ClearDay.detect(spark, df, site, tsCol, valueCol, clearSlotsPerDay)
      .select(col("site"), col("day").cast("date").as("day"), col("clear"))
    // day-grain ⋈ day-grain on (site, day): both sides are
    // sites×days rows — small relative to the scan at any data scale,
    // co-partitioned by the join keys; no broadcast assumption needed
    day.join(flags, Seq("site", "day"), "left")
      .withColumn("clear", coalesce(col("clear"), lit(false)))
  }

  private case class Cfg(name: String, labels: Seq[String], value: Column, sel: Column)

  /** Aggregate config medians per (site, data_matrix) and unpivot to
    * one row per config (stack AFTER aggregation — the config axis
    * never multiplies the day grain).
    *
    * The per-day estimate is lifted to 6-dp INTEGER MICROS before the
    * median: the inversion runs through libm transcendentals whose
    * last ulp is build-sensitive, and an even day count interpolates
    * the midpoint of two such doubles. On sub-2^52 integers the
    * midpoint (a+b)/2 is IEEE-exact under every interpolation formula,
    * so median-of-micros / 1e6 is bit-determined by the inputs alone —
    * no trailing decimal round, hence no half-way rounding boundary.
    */
  private def sweep(
      day: DataFrame,
      labelCols: Seq[String],
      configs: Seq[Cfg],
      estName: String
  ): DataFrame = {
    val aggs = configs.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        (percentile(when(c.sel, round(c.value * lit(1e6)).cast("long")),
          lit(0.5)) / lit(1e6)).as(s"est_$i"),
        sum(when(c.sel && c.value.isNotNull, 1L).otherwise(0L)).as(s"n_$i"))
    }
    val agged = day.groupBy(col("site"), col("data_matrix"))
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = configs.zipWithIndex.map { case (c, i) =>
      c.labels.map(l => s"'$l'").mkString(", ") + s", est_$i, n_$i"
    }.mkString(", ")
    agged.select(
      col("site"), col("data_matrix"),
      expr(s"stack(${configs.length}, $stackArgs)")
        .as(labelCols ++ Seq(estName, "n_days")))
  }

  /** Latitude study (reference `LatitudeStudy.run`,
    * `latitude_study.py:69-197`): (data matrix) × (daylight method) ×
    * (declination equation: Cooper 1.6.1a | Spencer 1.6.1b) ×
    * (day selection) → median per-day latitude inversion.
    *
    * Daylight methods: `sunrise-sunset` (boundary-safe rise/set span)
    * and `raw-daylight` (above-threshold sample count × sampling).
    * The reference's `optimized_estimates`/`optimized_measurements`
    * axis rides the sunrise/sunset optimizer —
    * [[SunriseSunset.estimates]], which emits both the smoothed curve
    * estimates and the raw threshold-crossing measurements — and is
    * enabled with `includeOptimized` (solver-priced: one optimizer
    * grid per enabled matrix, raw AND filled, as in the reference's
    * `get_optimized_sunrise_sunset(fdm, rdm)`).
    *
    * @return (site, data_matrix, daylight_method, delta_method,
    *   day_selection, latitude, n_days)
    */
  def latitudeStudy(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      threshold: Double = 0.001,
      includeFilled: Boolean = true,
      includeOptimized: Boolean = false,
      filledSlotsPerDay: Int = 96,
      clearSlotsPerDay: Int = 96,
      includeRaw: Boolean = true
  ): DataFrame = {
    val day0 = dayGrain(spark, df, site, tsCol, valueCol, threshold,
      includeFilled, filledSlotsPerDay, includeRaw)
    val day1 = withFlags(spark, day0, df, site, tsCol, valueCol, clearSlotsPerDay)
    val day =
      if (!includeOptimized)
        day1.withColumn("dl_opt_est", lit(null).cast("double"))
          .withColumn("dl_opt_meas", lit(null).cast("double"))
      else {
        // the reference runs the threshold optimizer on BOTH matrices
        // (`get_optimized_sunrise_sunset(fdm, rdm)`,
        // latitude_study.py:133-144) and sweeps both of its outputs:
        // the smoothed curve ESTIMATES and the raw threshold-crossing
        // MEASUREMENTS at the selected threshold. NaN days (no
        // crossing / failed fit) null out so they leave the medians
        // instead of poisoning them (NaN sorts above every double).
        val est = optimizedDaylightSides(spark, df, site, tsCol, valueCol,
          includeRaw, includeFilled, filledSlotsPerDay) { e =>
          e.select(col("site"), col("day"), col("data_matrix"),
            nanToNull(col("sunset_est") - col("sunrise_est")).as("dl_opt_est"),
            nanToNull(col("sunset_rough") - col("sunrise_rough")).as("dl_opt_meas"))
        }
        day1.join(est, Seq("site", "day", "data_matrix"), "left")
      }
    val daylights = Seq(
      "sunrise-sunset" -> col("dl_ss"),
      "raw-daylight" -> col("dl_raw")) ++
      (if (includeOptimized) Seq(
        "optimized-estimates" -> col("dl_opt_est"),
        "optimized-measurements" -> col("dl_opt_meas")) else Nil)
    val deltas = Seq(
      "cooper" -> Solar.declinationDeg(col("doy")),
      "spencer" -> Solar.declinationSpencerDeg(col("doy")))
    val sels = Seq(
      "all" -> lit(true),
      "clear" -> col("clear"),
      "cloudy" -> !col("clear"))
    val configs = for {
      (dlName, dl) <- daylights
      (dName, delta) <- deltas
      (sName, sel) <- sels
    } yield Cfg(s"$dlName/$dName/$sName", Seq(dlName, dName, sName), latDay(dl, delta), sel)
    sweep(day, Seq("daylight_method", "delta_method", "day_selection"), configs, "latitude")
  }

  /** Longitude study (reference `LongitudeStudy.run`,
    * `longitude_study.py:70-225`): (data matrix) × (solar-noon
    * method: energy center of mass | sunrise/sunset average |
    * optimized) × (equation of time: Duffie 1.5.3 | Da Rosa/Haghdadi)
    * × (day selection) × (estimator).
    *
    * Estimator axis (`longitude/fitting.py:5-22`): the residual
    * sn_h(lon) − solarnoon is LINEAR in lon with the same −1/15 h/°
    * slope every day, so the reference's scalar cvxpy fits have
    * closed forms over the per-day estimates lon_d = (720 − 60·SN_d −
    * EoT_d)/4 + 15·gmt — `fit_l2` is their mean, `fit_l1` (and
    * `calculated`) their median, and `fit_huber` their Huber location
    * estimate with scale 15°/h·M (cvx.huber's M = 1 on hour-grain
    * residuals ⇒ 15° in longitude units), computed by IRLS on the
    * bounded per-site day series inside `mapGroups`. No numerical
    * solver is needed where the argmin is a one-line aggregate.
    *
    * Mean parity: `fit_l2` lifts per-day values to 6-dp integer
    * micros and derives the mean from the exact integer sum (the q07
    * contract), so the hash gate survives any summation order.
    *
    * @return (site, data_matrix, solar_noon_method, eot_calculation,
    *   day_selection, estimator, longitude, n_days)
    */
  def longitudeStudy(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      gmtOffsetHours: Double = 0.0,
      threshold: Double = 0.001,
      includeFilled: Boolean = true,
      includeOptimized: Boolean = false,
      estimators: Seq[String] = Seq("calculated", "fit_l1", "fit_l2", "fit_huber"),
      filledSlotsPerDay: Int = 96,
      clearSlotsPerDay: Int = 96,
      includeRaw: Boolean = true
  ): DataFrame = {
    import spark.implicits._
    require(estimators.forall(Set("calculated", "fit_l1", "fit_l2", "fit_huber")),
      s"unknown estimator in $estimators")
    val day0 = dayGrain(spark, df, site, tsCol, valueCol, threshold,
      includeFilled, filledSlotsPerDay, includeRaw)
    val day1 = withFlags(spark, day0, df, site, tsCol, valueCol, clearSlotsPerDay)
    val day =
      if (!includeOptimized)
        day1.withColumn("noon_opt_est", lit(null).cast("double"))
          .withColumn("noon_opt_meas", lit(null).cast("double"))
      else {
        // both matrices × both optimizer outputs, as in the reference
        // longitude study's solar-noon axis (see [[latitudeStudy]])
        val est = optimizedDaylightSides(spark, df, site, tsCol, valueCol,
          includeRaw, includeFilled, filledSlotsPerDay) { e =>
          e.select(col("site"), col("day"), col("data_matrix"),
            nanToNull((col("sunrise_est") + col("sunset_est")) / 2.0).as("noon_opt_est"),
            nanToNull((col("sunrise_rough") + col("sunset_rough")) / 2.0).as("noon_opt_meas"))
        }
        day1.join(est, Seq("site", "day", "data_matrix"), "left")
      }
    val noons = Seq(
      "energy_com" -> col("noon_com"),
      "rise_set_average" -> col("noon_rs")) ++
      (if (includeOptimized) Seq(
        "optimized-estimates" -> col("noon_opt_est"),
        "optimized-measurements" -> col("noon_opt_meas")) else Nil)
    val eots = Seq(
      "duffie" -> Solar.equationOfTimeDuffieMin(col("doy")),
      "da_rosa" -> Solar.equationOfTimeDaRosaMin(col("doy")))
    val sels = Seq(
      "all" -> lit(true),
      "clear" -> col("clear"),
      "cloudy" -> !col("clear"))
    val combos = for {
      (nName, noon) <- noons
      (eName, eot) <- eots
    } yield (nName, eName, lonDay(noon, eot, gmtOffsetHours))

    // one day-grain projection carries every (noon × eot) lon series;
    // the relational estimators aggregate it, the Huber pass iterates
    // on it per site — both read the SAME frame
    val lonCols = combos.zipWithIndex.map { case ((_, _, c), i) => c.as(s"lon_$i") }
    val base = day.select(
      Seq(col("site"), col("data_matrix"), col("clear")) ++ lonCols: _*)

    val aggEstimators = estimators.filter(_ != "fit_huber")
    val relational: Option[DataFrame] =
      if (aggEstimators.isEmpty) None
      else {
        val aggs = combos.indices.flatMap { i =>
          sels.indices.flatMap { j =>
            val sel = sels(j)._2
            val x = col(s"lon_$i")
            Seq(
              // median over 6-dp integer micros: an even-count midpoint
              // of two sub-2^52 longs is IEEE-exact, so the estimate is
              // bit-determined regardless of libm ulp (see [[sweep]])
              percentile(when(sel, round(x * 1e6).cast("long")), lit(0.5))
                .as(s"med_${i}_$j"),
              // exact integer-micro sum → order-free mean (q07 rule)
              sum(when(sel, round(x * 1e6).cast("long"))).as(s"sum_${i}_$j"),
              sum(when(sel && x.isNotNull, 1L).otherwise(0L)).as(s"n_${i}_$j"))
          }
        }
        val agged = base.groupBy(col("site"), col("data_matrix"))
          .agg(aggs.head, aggs.tail: _*)
        val stackArgs = combos.zipWithIndex.flatMap { case ((nName, eName, _), i) =>
          sels.zipWithIndex.flatMap { case ((sName, _), j) =>
            aggEstimators.map { est =>
              val value = est match {
                case "fit_l2" =>
                  s"CAST(sum_${i}_$j AS DOUBLE) / 1e6 / n_${i}_$j"
                // calculated and fit_l1 = median (integer micros → °)
                case _ => s"med_${i}_$j / 1e6"
              }
              s"'$nName', '$eName', '$sName', '$est', $value, n_${i}_$j"
            }
          }
        }.mkString(", ")
        val nCfg = combos.length * sels.length * aggEstimators.length
        Some(agged.select(
          col("site"), col("data_matrix"),
          expr(s"stack($nCfg, $stackArgs)")
            .as(Seq("solar_noon_method", "eot_calculation", "day_selection",
              "estimator", "longitude", "n_days"))))
      }

    val huber: Option[DataFrame] =
      if (!estimators.contains("fit_huber")) None
      else {
        val comboMeta = combos.map { case (n, e, _) => (n, e) }
        // long format so the per-site state is one fixed-arity tuple
        // regardless of how many (noon × eot) combos are enabled
        val longRows = base.select(
          col("site"), col("data_matrix"), col("clear"),
          expr(s"stack(${combos.length}, ${combos.indices.map(i => s"$i, lon_$i").mkString(", ")})")
            .as(Seq("combo", "lon")))
          .filter(col("lon").isNotNull)
          .as[(Long, String, Boolean, Int, Double)]
        val fitted = longRows
          .groupByKey(r => (r._1, r._2))
          .flatMapGroups { (key: (Long, String), it: Iterator[(Long, String, Boolean, Int, Double)]) =>
            val pts = it.toArray
            for {
              i <- comboMeta.indices.iterator
              (sName, selIdx) <- Iterator(("all", 0), ("clear", 1), ("cloudy", 2))
            } yield {
              val vals = pts.iterator
                .filter(p => p._4 == i && (selIdx == 0 || (selIdx == 1) == p._3))
                .map(_._5).toArray
              val est: Option[Double] =
                if (vals.isEmpty) None else Some(huberLocation(vals, scale = 15.0))
              (key._1, key._2, comboMeta(i)._1, comboMeta(i)._2, sName, "fit_huber",
                est, vals.length.toLong)
            }
          }
          .toDF("site", "data_matrix", "solar_noon_method", "eot_calculation",
            "day_selection", "estimator", "longitude", "n_days")
        Some(fitted)
      }

    (relational, huber) match {
      case (Some(r), Some(h)) => r.unionByName(h)
      case (Some(r), None) => r
      case (None, Some(h)) => h
      case (None, None) =>
        throw new IllegalArgumentException("estimators must be non-empty")
    }
  }

  /** Huber location M-estimate by IRLS (weights min(1, scale/|x−μ|)),
    * median start, 1e-12 fixed point — the closed-loop equivalent of
    * the reference's scalar cvxpy huber fit (see [[longitudeStudy]]).
    */
  private[graft] def huberLocation(xs: Array[Double], scale: Double): Double = {
    val sorted = xs.sorted
    var mu =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    var it = 0
    var moved = true
    while (it < 100 && moved) {
      var sw = 0.0
      var swx = 0.0
      var k = 0
      while (k < xs.length) {
        val d = math.abs(xs(k) - mu)
        val w = if (d <= scale) 1.0 else scale / d
        sw += w; swx += w * xs(k); k += 1
      }
      val next = if (sw > 0) swx / sw else mu
      moved = math.abs(next - mu) > 1e-12
      mu = next
      it += 1
    }
    mu
  }

  /** The reference's season day-range dictionary
    * (`tilt_azimuth_study.py:83-91`). Wrapping ranges (winter,
    * winter_spring) select `doy > lo OR doy < hi`; the reference's
    * strict conjunction makes its own wrapping entries select nothing
    * — an apparent bug we do not reproduce (the season names state
    * the intent).
    */
  val SeasonRanges: Seq[(String, Option[(Int, Int)])] = Seq(
    "full_year" -> None,
    "summer" -> Some((171, 265)),
    "no_winter" -> Some((79, 355)),
    "spring" -> Some((79, 171)),
    "winter" -> Some((355, 79)),
    "winter_spring" -> Some((355, 171)))

  /** Tilt/azimuth config-sweep study (reference
    * `TiltAzimuthStudy.run`, `tilt_azimuth_study.py:142-317`): (season
    * day range) × (declination equation) × (daytime threshold) →
    * per-config Duffie cosθ curve fit.
    *
    * Spark-first shape: the bounded envelope-cell table
    * ([[Profiler.orientationCells]], ≤ 366×24 rows per site) is built
    * ONCE from the scan; configs cross-join only that cell table
    * (day-range and threshold are cell-level predicates — the
    * envelope max commutes with the daytime threshold, see
    * `orientationCells`), and the per-(site, config) fits run
    * fleet-parallel in one `mapGroups` pass. The reference re-filters
    * the matrix and re-fits serially per config
    * (`tilt_azimuth_study.py:193-264`).
    *
    * @param dayRanges (name, None = full year | Some(lo, hi):
    *   day-of-year in the EXCLUSIVE (lo, hi), wrapping when lo > hi)
    * @param daytimeThresholds normalized-power envelope cutoffs (the
    *   reference's filter_data quantile axis; its default fit
    *   threshold is [[Profiler.OrientationDaytimeThreshold]])
    * @return (site, day_range, delta_method, daytime_threshold,
    *   lat_est, tilt_deg, azimuth_duffie_deg, n_cells)
    */
  def tiltAzimuthStudy(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      dayRanges: Seq[(String, Option[(Int, Int)])] = SeasonRanges,
      deltaMethods: Seq[String] = Seq("cooper", "spencer"),
      daytimeThresholds: Seq[Double] = Seq(Profiler.OrientationDaytimeThreshold),
      latOverride: Option[DataFrame] = None,
      useFilled: Boolean = false,
      filledSlotsPerDay: Int = 96,
      // the reference's (threshold_x1 × threshold_x2) axis
      // (`tilt_azimuth_study.py:193-198`): when non-empty, the fixed
      // daytimeThresholds axis is REPLACED by per-day seasonal
      // thresholds — the reference's daytime_threshold=None branch
      thresholdQuantiles: Seq[(Double, Double)] = Nil
  ): DataFrame = {
    import spark.implicits._
    require(deltaMethods.forall(Set("cooper", "spencer")),
      s"unknown delta method in $deltaMethods")
    // the reference study reads data_handler.filled_data_matrix
    // (tilt_azimuth_study.py:97) — `useFilled` routes the envelope
    // cells through the SAME filled grid the rest of the engine
    // publishes (q50), re-expressed at event grain so one cell
    // derivation serves both matrices
    val in = if (!useFilled) df else filledAsEvents(df, site, tsCol, valueCol, filledSlotsPerDay)
    val cells = Profiler.orientationCells(spark, in, site, tsCol, valueCol, latOverride)
    if (thresholdQuantiles.nonEmpty)
      return tiltAzimuthStudySeasonal(spark, in, cells, site, tsCol, valueCol,
        dayRanges, deltaMethods, thresholdQuantiles)
    // collision-free pack over the full cross-product (a decimal pack
    // like rIdx*100 + dIdx*10 + tIdx silently merges two configs into
    // one group once any axis reaches 10 entries — wrong fits, no error)
    val configs = for {
      ((rName, range), rIdx) <- dayRanges.zipWithIndex
      (dName, dIdx) <- deltaMethods.zipWithIndex
      (thr, tIdx) <- daytimeThresholds.zipWithIndex
    } yield ((rIdx * deltaMethods.length + dIdx) * daytimeThresholds.length + tIdx,
      rName, range, dName, thr)
    val cfgDf = spark.createDataset(
      configs.map { case (id, rName, range, dName, thr) =>
        (id, rName, range.map(_._1).getOrElse(-1), range.map(_._2).getOrElse(-1), dName, thr)
      }).toDF("cfg_id", "day_range", "lo", "hi", "delta_method", "daytime_threshold")
    val inRange =
      when(col("lo") < 0, lit(true))
        .when(col("lo") < col("hi"), col("doy") > col("lo") && col("doy") < col("hi"))
        .otherwise(col("doy") > col("lo") || col("doy") < col("hi"))
    val routed = cells
      .crossJoin(broadcast(cfgDf))
      .filter(inRange && col("ct") > col("daytime_threshold"))
      .select(col("__site"), col("cfg_id"), col("day_range"), col("delta_method"),
        col("daytime_threshold"), col("doy"), col("hslot"), col("ct"), col("noon"),
        col("lat_est"))
      .as[(String, Int, String, String, Double, Int, Int, Double, Double, Double)]
    routed
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, Int), it: Iterator[(String, Int, String, String, Double, Int, Int, Double, Double, Double)]) =>
        val siteId = key._1
        val pts = it.toArray
        val p0 = pts(0)
        val (tilt, az) = Profiler.fitOrientation(
          pts.map(_._6), pts.map(_._7), pts.map(_._8),
          noonH = p0._9, latDeg = p0._10, spencer = p0._4 == "spencer")
        (siteId, p0._3, p0._4, p0._5, p0._10, tilt, az, pts.length)
      }
      .toDF(site, "day_range", "delta_method", "daytime_threshold",
        "lat_est", "tilt_deg", "azimuth_duffie_deg", "n_cells")
  }

  /** The seasonal-threshold variant of [[tiltAzimuthStudy]] — the
    * reference's daytime_threshold=None branch: each (x1, x2) config
    * filters the envelope cells by the per-day seasonal threshold
    * from [[Profiler.seasonalDaytimeThresholds]] instead of a fixed
    * cut. A cell passes iff its max normalized entry clears that
    * day's threshold — equivalent to the reference's entry-grain
    * boolean mask restricted to the envelope entries our design fits
    * on. One day-grain join multiplies the cells by the quantile
    * configs; no extra scan pass.
    *
    * @return (<site>, day_range, delta_method, x1, x2, lat_est,
    *   tilt_deg, azimuth_duffie_deg, n_cells)
    */
  private def tiltAzimuthStudySeasonal(
      spark: SparkSession,
      in: DataFrame,
      cells: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      dayRanges: Seq[(String, Option[(Int, Int)])],
      deltaMethods: Seq[String],
      thresholdQuantiles: Seq[(Double, Double)]
  ): DataFrame = {
    import spark.implicits._
    val thr = Profiler.seasonalDaytimeThresholds(
      spark, in, site, tsCol, valueCol, thresholdQuantiles)
    // collision-free pack (see tiltAzimuthStudy: decimal packs merge
    // configs once an axis reaches its radix)
    val rdCfg = for {
      ((rName, range), rIdx) <- dayRanges.zipWithIndex
      (dName, dIdx) <- deltaMethods.zipWithIndex
    } yield (rIdx * deltaMethods.length + dIdx, rName,
      range.map(_._1).getOrElse(-1), range.map(_._2).getOrElse(-1), dName)
    val rdDf = spark.createDataset(rdCfg)
      .toDF("rd_id", "day_range", "lo", "hi", "delta_method")
    val inRange =
      when(col("lo") < 0, lit(true))
        .when(col("lo") < col("hi"), col("doy") > col("lo") && col("doy") < col("hi"))
        .otherwise(col("doy") > col("lo") || col("doy") < col("hi"))
    val routed = cells
      .join(thr, Seq("__site", "doy"))
      .crossJoin(broadcast(rdDf))
      .filter(inRange && col("ct") > col("thr_norm"))
      .select(col("__site"),
        (col("rd_id") * lit(thresholdQuantiles.length) + col("cfg_id")).as("cfg"),
        col("day_range"), col("delta_method"), col("x1"), col("x2"),
        col("doy"), col("hslot"), col("ct"), col("noon"), col("lat_est"))
      .as[(String, Int, String, String, Double, Double, Int, Int, Double, Double, Double)]
    routed
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, Int), it: Iterator[(String, Int, String, String, Double, Double, Int, Int, Double, Double, Double)]) =>
        val pts = it.toArray
        val p0 = pts(0)
        val (tilt, az) = Profiler.fitOrientation(
          pts.map(_._7), pts.map(_._8), pts.map(_._9),
          noonH = p0._10, latDeg = p0._11, spencer = p0._4 == "spencer")
        (key._1, p0._3, p0._4, p0._5, p0._6, p0._11, tilt, az, pts.length)
      }
      .toDF(site, "day_range", "delta_method", "x1", "x2",
        "lat_est", "tilt_deg", "azimuth_duffie_deg", "n_cells")
  }

  /** NaN → null so failed-fit / no-crossing days drop out of medians
    * instead of poisoning them (NaN sorts above every double). */
  private def nanToNull(c: Column): Column = when(!isnan(c), c)

  /** The per-(site, day) sunrise/sunset optimizer outputs for every
    * enabled data matrix (the reference runs
    * `get_optimized_sunrise_sunset(fdm, rdm)` on BOTH matrices —
    * `latitude_study.py:133-144`), labeled and projected for the
    * study join. Solver-priced: one optimizer grid per matrix.
    */
  private def optimizedDaylightSides(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      includeRaw: Boolean,
      includeFilled: Boolean,
      filledSlotsPerDay: Int
  )(project: DataFrame => DataFrame): DataFrame = {
    val sides = Seq(
      (includeRaw, "raw", () => df),
      (includeFilled, "filled",
        () => filledAsEvents(df, site, tsCol, valueCol, filledSlotsPerDay)))
      .collect { case (true, label, mk) =>
        project(
          SunriseSunset.estimates(spark, mk(), site, tsCol, valueCol)
            .select(col(site).cast("long").as("site"), col("day"),
              col("sunrise_est"), col("sunset_est"),
              col("sunrise_rough"), col("sunset_rough"))
            .withColumn("data_matrix", lit(label)))
      }
    sides.reduce(_ unionByName _)
  }

  /** The filled day grid re-expressed at (site, ts, value) event
    * grain — ts = local midnight + slot·pitch — so any event-grain
    * operator (the orientation cell builder, rise/set detection) can
    * run on the filled matrix unchanged.
    */
  def filledAsEvents(
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      slotsPerDay: Int
  ): DataFrame = {
    val pitchS = 86400 / slotsPerDay
    // site-keyed repartition: consumers of this frame (the orientation
    // cell builder aggregates it 3-4 times) share one Exchange via
    // Spark's exchange reuse instead of re-running the grid pipeline
    // tail per consumer (the q64/q65 measured win, same shape)
    Filling.filledDayGrid(df, site, tsCol, valueCol, slotsPerDay)
      .select(
        col("site").as(site),
        expr(s"timestampadd(SECOND, slot * $pitchS, CAST(day AS TIMESTAMP))").as(tsCol),
        col("filled").as(valueCol))
      .repartition(col(site))
  }

  /** Estimate-vs-truth residual for a study table (the reference's
    * `results["residual"] = true_value − estimate`,
    * `latitude_study.py:193-195`).
    *
    * @param truth (<site>, <trueCol>) — site-grain, broadcast
    */
  def withResidual(
      study: DataFrame,
      truth: DataFrame,
      site: String,
      estCol: String,
      trueCol: String
  ): DataFrame =
    study
      .join(broadcast(truth.select(col(site).cast("long").as("site"), col(trueCol))), Seq("site"))
      .withColumn("residual", col(trueCol) - col(estCol))
}
