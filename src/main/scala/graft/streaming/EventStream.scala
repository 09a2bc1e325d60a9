package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Structured Streaming face of the engine (SURVEY §2.11 — an
  * extension, not a port requirement: the reference is batch-only).
  *
  * Incremental per-site quality monitoring: file-arrival (or
  * `Trigger.AvailableNow`) micro-batches → watermarked windowed
  * aggregation of the same DayStats metrics the batch path computes.
  * State is bounded by the watermark; at fleet scale the shuffle keys
  * are (site, window) — the same partitioning the batch plan uses.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Read a directory of parquet/json event files as a stream. */
  def readEvents(spark: SparkSession, path: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(path)

  /** Hourly per-site rollup with a 30-minute watermark for late
    * scans: count, energy sum, density proxy, max.
    */
  def hourlyStats(events: DataFrame, capacityHint: Double): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("user_id"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("value")).as("sum_v"),
        max(col("value")).as("max_v"),
        avg(when(col("value") > capacityHint * 0.02, 1.0).otherwise(0.0)).as("density")
      )
      .select(
        col("win.start").as("window_start"),
        col("user_id"), col("n_obs"), col("sum_v"), col("max_v"), col("density")
      )

  /** Drive a streaming aggregation synchronously over whatever data is
    * present (test/backfill path): AvailableNow + memory sink.
    */
  def runAvailableNow(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  case class Ev(day: String, user_id: Long, value: Double)

  /** [[Ev]] plus the fractional hour of day — the timed event the
    * intra-day twins (rise/set) fold; value-only twins adapt through
    * [[finalizedFold]] so there is ONE closure core.
    */
  case class EvH(day: String, user_id: Long, value: Double, h: Double)

  /** [[EvH]] plus the event type — the error-channel-aware twins. */
  case class EvT(day: String, user_id: Long, value: Double, h: Double, etype: String)
  case class SiteAgg(site: Long, nDays: Int, nObs: Long, totalV: Double, maxV: Double)
  case class SiteDay(site: Long, day: String, nObs: Long, sumV: Double, maxV: Double)

  /** Shared day-closure core for every finalization stream: fold
    * events into per-open-day aggregates `D`, close a site's day as
    * soon as a strictly later day is seen (all but the site's max
    * day), DROP late rows for already-closed days (per-site closed-day
    * watermark — closed days are final), and hand closed days to an
    * analytic fold `onClose` that threads a per-site carry `C`
    * (running envelope, site max, jump ring, …) and emits the output
    * rows. State per site: open-day aggregates + watermark + carry —
    * the O(1)-in-stream-length shape every twin shares. State is
    * kryo-encoded (generic `D`/`C`); outputs append to parquet.
    */
  def finalizedFold[D, C, O](
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      zero: D,
      foldEv: (D, Double) => D,
      carry0: C,
      onClose: (C, Long, String, D) => (C, Seq[O])
  )(implicit outEnc: org.apache.spark.sql.Encoder[O]): DataFrame =
    finalizedFoldH(spark, path, checkpoint, outDir, zero,
      (d: D, e: EvH) => foldEv(d, e.value), carry0, onClose)

  /** [[finalizedFold]] over TIMED events ([[EvH]], value + hour of
    * day) — the same closure/watermark/carry core; value-only twins
    * delegate here so the closure rule has one definition.
    */
  def finalizedFoldH[D, C, O](
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      zero: D,
      foldEv: (D, EvH) => D,
      carry0: C,
      onClose: (C, Long, String, D) => (C, Seq[O])
  )(implicit outEnc: org.apache.spark.sql.Encoder[O]): DataFrame = {
    import spark.implicits._
    val evs = readEvents(spark, path)
      // null ts/value guard: the Ev decode is non-nullable, and a single
      // poisoned file would otherwise kill the query on every restart
      .filter(col("ts").isNotNull && col("user_id").isNotNull && col("value").isNotNull)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"), col("value"),
        graft.operators.TimeAxis.hourOfDay(col("ts")).as("h"))
      .as[EvH]
    finalizedFoldCore[EvH, D, C, O](spark, evs, _.user_id, _.day,
      checkpoint, outDir, zero, foldEv, carry0, onClose)
  }

  /** [[finalizedFoldH]] over TYPED events ([[EvT]]: value + hour +
    * event type) — the twins that need the error channel (sensor-ID
    * moments) ride the same closure core through this face.
    */
  def finalizedFoldT[D, C, O](
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      zero: D,
      foldEv: (D, EvT) => D,
      carry0: C,
      onClose: (C, Long, String, D) => (C, Seq[O])
  )(implicit outEnc: org.apache.spark.sql.Encoder[O]): DataFrame = {
    import spark.implicits._
    val evs = readEvents(spark, path)
      .filter(col("ts").isNotNull && col("user_id").isNotNull && col("value").isNotNull)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"), col("value"),
        graft.operators.TimeAxis.hourOfDay(col("ts")).as("h"),
        coalesce(col("event_type"), lit("")).as("etype"))
      .as[EvT]
    finalizedFoldCore[EvT, D, C, O](spark, evs, _.user_id, _.day,
      checkpoint, outDir, zero, foldEv, carry0, onClose)
  }

  /** THE closure core, generic over the event row shape: every
    * finalization twin folds through here, so the per-site closed-day
    * watermark / open-day state / carry semantics have exactly one
    * definition.
    */
  private def finalizedFoldCore[E, D, C, O](
      spark: SparkSession,
      evs: org.apache.spark.sql.Dataset[E],
      siteOf: E => Long,
      dayOf: E => String,
      checkpoint: String,
      outDir: String,
      zero: D,
      foldEv: (D, E) => D,
      carry0: C,
      onClose: (C, Long, String, D) => (C, Seq[O])
  )(implicit outEnc: org.apache.spark.sql.Encoder[O]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Map[String, D], String, C)] =
      org.apache.spark.sql.Encoders.kryo[(Map[String, D], String, C)]
    val out = evs
      .groupByKey(siteOf)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (site: Long, it: Iterator[E], state: GroupState[(Map[String, D], String, C)]) =>
          val (open0, closedMax, c0) =
            state.getOption.getOrElse((Map.empty[String, D], "", carry0))
          val m = it.foldLeft(open0) { (acc, e) =>
            val d = dayOf(e)
            if (d <= closedMax) acc // late row for a finalized day: drop
            else acc.updated(d, foldEv(acc.getOrElse(d, zero), e))
          }
          if (m.isEmpty) Iterator.empty
          else {
            val maxDay = m.keys.max
            val (open, closed) = m.partition(_._1 == maxDay)
            val newClosedMax = if (closed.isEmpty) closedMax else {
              val c = closed.keys.max; if (c > closedMax) c else closedMax
            }
            var carry = c0
            val outRows = closed.toSeq.sortBy(_._1).flatMap { case (day, d) =>
              val (c2, os) = onClose(carry, site, day, d)
              carry = c2
              os
            }
            state.update((open, newClosedMax, carry))
            outRows.iterator
          }
      }
    StreamSink.runAppend(spark, out.toDF(), checkpoint, outDir, Trigger.AvailableNow())
  }

  case class SensorMomentRow(
      site: Long, day: String, n: Long, sy: Long, syy: Long, err: Int,
      sensor: String, sx: Long, sxx: Long, sxy: Long)

  /** Streaming twin of [[graft.analyses.SensorId.dayMoments]] for the
    * two hour-derived sensor channels (the triangular daylight proxy
    * and the linear hour ramp — the q84 synthesis): per (site, day,
    * sensor) integer-micro moment rows, emitted once at day close.
    * The CV itself ([[graft.analyses.SensorId.identify]]'s fold /
    * train-window algebra) is a cheap day-grain batch over these
    * finalized rows — the expensive raw-scan reduction is what streams.
    * Per-row lifts use the same HALF_UP decimal rounding as the batch
    * `round(x·1e6)` columns, and integer sums are order-free, so a
    * closed day's row is BIT-equal to the batch grain.
    */
  def incrementalSensorMoments(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String
  ): DataFrame = {
    import spark.implicits._
    def li(x: Double, s: Double): Long =
      BigDecimal(x * s).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // per-day state: (n, sy, syy, err, sxT, sxxT, sxyT, sxL, sxxL, sxyL)
    type D = (Long, Long, Long, Int, Long, Long, Long, Long, Long, Long)
    finalizedFoldT[D, Unit, SensorMomentRow](
      spark, path, checkpoint, outDir,
      zero = (0L, 0L, 0L, 0, 0L, 0L, 0L, 0L, 0L, 0L),
      foldEv = { (d, e) =>
        val y = e.value
        val sTri = math.max(0.0, 12.0 - math.abs(e.h - 12.0)) * 75.0
        val sLin = e.h * 40.0
        (d._1 + 1, d._2 + li(y, 1e6), d._3 + li(y * y, 1e4),
          math.max(d._4, if (e.etype == "error") 1 else 0),
          d._5 + li(sTri, 1e6), d._6 + li(sTri * sTri, 1e4), d._7 + li(sTri * y, 1e4),
          d._8 + li(sLin, 1e6), d._9 + li(sLin * sLin, 1e4), d._10 + li(sLin * y, 1e4))
      },
      carry0 = (),
      onClose = { (_, site, day, d) =>
        ((), Seq(
          SensorMomentRow(site, day, d._1, d._2, d._3, d._4, "s_tri", d._5, d._6, d._7),
          SensorMomentRow(site, day, d._1, d._2, d._3, d._4, "s_lin", d._8, d._9, d._10)))
      }
    )
  }

  /** Streaming DAY FINALIZATION — the streaming twin of the batch
    * DayStats fact table in append semantics: per site, a day's stats
    * are emitted exactly once, as soon as a strictly later day is seen
    * for that site (per-site event-time closure). State holds only the
    * still-open day(s) per site, so it is bounded by sites — not by
    * history — no matter how long the stream runs. Closed days are
    * final: downstream (pipeline solver stages, reports) can consume
    * them append-only, which is what makes the batch DayStats →
    * analyses chain incrementally maintainable.
    *
    * Assumes per-site day ordering across batches (telemetry arrives
    * roughly in time order; use the watermarked [[hourlyStats]] when
    * that does not hold). The assumption is ENFORCED, not just
    * documented: the state carries the max closed day per site as a
    * watermark, and a late row for an already-closed day is DROPPED —
    * it must not silently recreate the day and re-emit it with partial
    * stats, because closed days are final for downstream consumers of
    * the append-only output.
    */
  def finalizedDayStats(spark: SparkSession, path: String, checkpoint: String, outDir: String): DataFrame = {
    import spark.implicits._
    finalizedFold[(Long, Double, Double), Unit, SiteDay](
      spark, path, checkpoint, outDir,
      zero = (0L, 0.0, Double.MinValue),
      foldEv = { case ((n, s, mx), v) => (n + 1, s + v, math.max(mx, v)) },
      carry0 = (),
      onClose = { case (_, site, day, (n, s, mx)) => ((), Seq(SiteDay(site, day, n, s, mx))) }
    )
  }

  case class SiteDayLabel(site: Long, day: String, energy: Double, clear: Boolean)

  /** Streaming twin of the clear-day SOLVER stage: as days finalize
    * (same closure rule as [[finalizedDayStats]]), each closed day is
    * labeled clear/cloudy against the site's EXPANDING energy envelope
    * (running max of closed-day energies, including the day itself) —
    * the append-only analytic the batch pipeline derives from the full
    * series, re-expressed over the prefix available at emission time.
    * Emitted labels are final and never revised (by construction the
    * envelope only grows, so a day labeled clear at closure could only
    * LOSE the label under a later, larger envelope — acceptable and
    * documented semantics of the streaming face: labels are relative
    * to data seen so far, exactly reproducible by a batch expanding
    * window (`max(...) over (order by day rows unbounded preceding)`).
    * State per site: open day aggregates + closed-day watermark + one
    * running max — O(1) in stream length.
    */
  def incrementalClearDays(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      clearFrac: Double = 0.8
  ): DataFrame = {
    import spark.implicits._
    finalizedFold[(Long, Double, Double), Double, SiteDayLabel](
      spark, path, checkpoint, outDir,
      zero = (0L, 0.0, Double.MinValue),
      foldEv = { case ((n, s, mx), v) => (n + 1, s + v, math.max(mx, v)) },
      carry0 = Double.MinValue,
      onClose = { case (runMax0, site, day, (n, s, _)) =>
        val energy = s * 24.0 / n
        val runMax = math.max(runMax0, energy)
        (runMax, Seq(SiteDayLabel(site, day, energy, energy >= clearFrac * runMax)))
      }
    )
  }

  case class SiteDayClip(
      site: Long, day: String, dailyMax: Double, clip2: Double,
      siteMaxSoFar: Double, clip1SoFar: Double)

  /** Streaming twin of the clipping statistics (`DayStats.clipStats`,
    * reference `clipping.py:54-68`): as days finalize (same closure
    * rule as [[finalizedDayStats]]), each closed day emits its
    * `clip2` — a PURE per-day statistic, so the emitted value is
    * final and exactly batch-equivalent — plus `clip1SoFar` against
    * the site's EXPANDING max (running max of closed daily maxes,
    * including the day itself): the streaming face of the
    * full-series `clip1`, reproducible in batch by an expanding
    * `max(daily_max) over (order by day)` window. State per site:
    * the open day's value buffer (bounded by scans-per-day), the
    * closed-day watermark, and one running max — O(scans/day), flat
    * in stream length.
    */
  def incrementalClipStats(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String
  ): DataFrame = {
    import spark.implicits._
    finalizedFold[Vector[Double], Double, SiteDayClip](
      spark, path, checkpoint, outDir,
      zero = Vector.empty[Double],
      foldEv = (vs, v) => vs :+ v,
      carry0 = Double.MinValue,
      onClose = { (siteMax0, site, day, vs) =>
        val dmax = vs.max
        val clip2 =
          if (dmax > 0) {
            var num = 0.0; var den = 0.0
            vs.foreach { v =>
              val np = v / dmax
              if (np > 0.995) num += np
              den += np
            }
            if (den != 0.0) num / den else Double.NaN
          } else Double.NaN
        val siteMax = math.max(siteMax0, dmax)
        (siteMax, Seq(SiteDayClip(site, day, dmax, clip2, siteMax, dmax / siteMax)))
      }
    )
  }

  case class SiteDayRiseSet(
      site: Long, day: String, rise_h: Double, set_h: Double, daylight_h: Double)

  /** Streaming twin of the rough sunrise/sunset table (q18's measured
    * times, reference `sunrise_sunset.py:11-27`): as days finalize,
    * emit the day's first/last hour with value above thresholdFrac ×
    * the site's EXPANDING max (running max over closed daily maxes
    * including the day itself — the same carry shape as
    * [[incrementalClipStats]]'s clip1; the batch rule thresholds
    * against the FULL-series max, so early days here see a
    * still-growing threshold base, reproducible in batch with an
    * expanding `max(daily_max) over (order by day)` window). A day
    * with no above-threshold sample, or whose first/last sample is
    * itself the extreme (the rise_set_rough argmax guards), emits
    * NaN for that side. State per site: the open day's (h, v) buffer
    * (≤ scans/day) + watermark + one running max — flat in stream
    * length. Feeds the same day-grain consumers as
    * [[graft.analyses.SunriseSunset]]'s measured times; the
    * threshold-TUNING loop stays batch (it needs the whole series).
    */
  def incrementalRiseSet(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      thresholdFrac: Double = 0.05
  ): DataFrame = {
    import spark.implicits._
    finalizedFoldH[Vector[(Double, Double)], Double, SiteDayRiseSet](
      spark, path, checkpoint, outDir,
      zero = Vector.empty[(Double, Double)],
      foldEv = (vs, e) => vs :+ ((e.h, e.value)),
      carry0 = Double.MinValue,
      onClose = { (siteMax0, site, day, hv) =>
        val dmax = hv.iterator.map(_._2).max
        val siteMax = math.max(siteMax0, dmax)
        val thr = siteMax * thresholdFrac
        val hFirst = hv.iterator.map(_._1).min
        val hLast = hv.iterator.map(_._1).max
        val lit2 = hv.filter(_._2 > thr)
        val rise =
          if (lit2.isEmpty) Double.NaN
          else { val r = lit2.iterator.map(_._1).min; if (r == hFirst) Double.NaN else r }
        val set =
          if (lit2.isEmpty) Double.NaN
          else { val s = lit2.iterator.map(_._1).max; if (s == hLast) Double.NaN else s }
        (siteMax, Seq(SiteDayRiseSet(site, day, rise, set, set - rise)))
      }
    )
  }

  case class SiteDayLocation(
      site: Long, day: String, dlH: Double, comHour: Double,
      latDay: Double, lonDay: Double)

  /** Streaming twin of the location profiler (q37 /
    * `Profiler.estimateLocation`): as days finalize, emit the day's
    * latitude and longitude estimates — daylight span above
    * `thresholdFrac` of the EXPANDING site max (the
    * [[incrementalRiseSet]]/[[incrementalClipStats]] convention:
    * batch-reproducible with an expanding-max window; the batch
    * full-series threshold is its limit as history accumulates),
    * energy-center-of-mass solar noon, then the same Cooper
    * declination inversion and Spencer equation-of-time correction
    * the batch profiler applies. The SITE estimate remains a median
    * over the emitted day rows — an aggregation the monitoring job
    * runs over the sink, exactly as q51's neighborhood argmax stays a
    * batch post-filter. A fleet's location dashboard thus refreshes
    * per micro-batch without ever rescanning history. State per
    * site: the open day's (hour, value) buffer + the closure
    * watermark + one running max — O(scans/day), flat in stream
    * length.
    */
  def incrementalLocationDays(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      thresholdFrac: Double = 0.05,
      gmtOffsetHours: Double = 0.0
  ): DataFrame = {
    import spark.implicits._
    finalizedFoldH[Vector[(Double, Double)], Double, SiteDayLocation](
      spark, path, checkpoint, outDir,
      zero = Vector.empty[(Double, Double)],
      foldEv = (vs, e) => vs :+ ((e.h, e.value)),
      carry0 = Double.MinValue,
      onClose = { (siteMax0, site, day, hv) =>
        val siteMax = math.max(siteMax0, hv.iterator.map(_._2).max)
        val thr = siteMax * thresholdFrac
        val lit2 = hv.filter(_._2 > thr)
        val dl =
          if (lit2.isEmpty) Double.NaN
          else lit2.iterator.map(_._1).max - lit2.iterator.map(_._1).min
        val sv = hv.iterator.map(_._2).sum
        val com = if (sv == 0.0) Double.NaN else hv.iterator.map(p => p._1 * p._2).sum / sv
        val doy = java.time.LocalDate.parse(day).getDayOfYear
        val decl = math.toRadians(23.45 * math.sin(2 * math.Pi * (284.0 + doy) / 365.0))
        val lat = math.toDegrees(math.atan(-math.cos(math.toRadians(7.5 * dl)) / math.tan(decl)))
        val b = 2 * math.Pi * (doy - 1.0) / 365.0
        val eot = 229.18 * (0.000075 + 0.001868 * math.cos(b) - 0.032077 * math.sin(b)
          - 0.014615 * math.cos(2 * b) - 0.04089 * math.sin(2 * b))
        val lon = -15.0 * (com - gmtOffsetHours - 12.0 + eot / 60.0)
        (siteMax, Seq(SiteDayLocation(site, day, dl, com, lat, lon)))
      }
    )
  }

  case class SiteDayJump(site: Long, day: String, jumpR: Double)

  /** Streaming twin of the capacity-change detector (q51's windowed
    * log-ratio rule): as days finalize, each closed day's log daily
    * max enters a per-site ring of the last 14 closed days, and the
    * day at the ring's pivot (index 7) emits its jump — mean(log dmax
    * of the pivot's 7-day from-frame) minus mean(of the 7 before),
    * rounded to the 1e-6 grid like the batch query. A day is
    * therefore emitted with a 6-closed-day lag and is FINAL at
    * emission (both window frames complete), bit-equal to the batch
    * windowed computation restricted to full-frame days (q51 also
    * emits partial-frame edge days; the streaming face defers until
    * frames fill). State per site: ≤14 (day, log-max) pairs + the
    * open-day aggregate + the closure watermark — O(1) in stream
    * length. The ±3-day neighborhood argmax (change-point uniqueness)
    * stays a batch post-filter over the emitted jumps, as in q51.
    */
  def incrementalCapacityJumps(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String
  ): DataFrame = {
    import spark.implicits._
    finalizedFold[Double, List[(String, Double)], SiteDayJump](
      spark, path, checkpoint, outDir,
      zero = Double.MinValue,
      foldEv = (mx, v) => math.max(mx, v),
      carry0 = List.empty[(String, Double)],
      onClose = { (ring0, site, day, dmax) =>
        // the pivot (index 7) has its 7 preceding closed days (0..6)
        // and its own 7-day from-frame (7..13) exactly when the ring
        // holds 14 — it is then final
        val ring = (ring0 :+ (day, math.log(math.max(dmax, 1e-9)))).takeRight(14)
        val out =
          if (ring.length == 14) {
            val (pivotDay, _) = ring(7)
            val before = ring.slice(0, 7).map(_._2)
            val after = ring.slice(7, 14).map(_._2)
            val jump = after.sum / 7.0 - before.sum / 7.0
            Seq(SiteDayJump(site, pivotDay,
              BigDecimal(jump).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          } else Seq.empty
        (ring, out)
      }
    )
  }

  case class SiteReportRow(
      site: Long, as_of: String, n_days: Long, capacity: Double,
      quality_score: Double, mean_density: Double, mean_energy: Double,
      inverter_clipping: Boolean)

  /** Streaming twin of the relational fleet report (p07, reference
    * `DataHandler.report` restricted to its SQL-expressible columns):
    * the per-site report row is RE-EMITTED every time one of the
    * site's days closes, so the latest row per site IS the current
    * fleet dashboard — refreshed per micro-batch without rescanning
    * history.
    *
    * Split of labor (the `analyses.Refit` philosophy): the two
    * quantities that need the full value distribution — the p95
    * capacity and the q49 inverter-clipping verdict — are INJECTED
    * from the last full rebuild (`siteStatic`: site → (raw capacity,
    * clipping verdict)); the stream maintains the additive columns
    * exactly. Per closed day the same arithmetic as the batch report:
    * day energy and usable density rounded to the fixed decimal grid,
    * lifted to integer micro-units, summed as longs (order-free), and
    * the site means derived from those integers by the exact
    * round-half-up quotient `(2s + n) div (2n)` — so the snapshot
    * equals the batch report on every closed day at any history
    * length. The day-grain float sums themselves fold in arrival
    * order vs the batch shuffle order (the usual 2-dp-absorbed
    * straddle class, same caveat as the batch gate's percentile
    * note).
    *
    * Sites absent from `siteStatic` (first seen after the rebuild)
    * are withheld until the next rebuild provides their capacity —
    * a report row with an uncalibrated threshold would be wrong, not
    * just late. State per site: open-day partials + four carry longs.
    */
  def incrementalSiteReport(
      spark: SparkSession,
      path: String,
      checkpoint: String,
      outDir: String,
      siteStatic: Map[Long, (Double, Boolean)]
  ): DataFrame = {
    import spark.implicits._
    def rnd(x: Double, scale: Int): Double =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    // batch p07 thresholds on round(raw_capacity * 0.02, 6)
    val thr: Map[Long, Double] =
      siteStatic.map { case (s, (cap, _)) => s -> rnd(cap * 0.02, 6) }
    // D = (n_slots, sum_v, n_above); C = (n_days, n_good, sum_dm, sum_edu)
    finalizedFoldH[(Long, Double, Long), (Long, Long, Long, Long), SiteReportRow](
      spark, path, checkpoint, outDir,
      zero = (0L, 0.0, 0L),
      foldEv = { (d, e) =>
        val above = thr.get(e.user_id).exists(t => e.value > t)
        (d._1 + 1, d._2 + e.value, d._3 + (if (above) 1L else 0L))
      },
      carry0 = (0L, 0L, 0L, 0L),
      onClose = { (c, site, day, d) =>
        siteStatic.get(site) match {
          case None => (c, Seq.empty) // uncalibrated site: withhold
          case Some((cap, clip)) =>
            val (nSlots, sumV, nAbove) = d
            val sumVr = rnd(sumV, 2)
            val energyDu = BigDecimal(rnd(sumVr * 24.0 / nSlots, 4) * 1e4)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            val densityMicro = BigDecimal(rnd(nAbove.toDouble / nSlots, 6) * 1e6)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            val good = nSlots >= 10L && (sumV / nSlots) > 0.0
            val c2 = (c._1 + 1L, c._2 + (if (good) 1L else 0L),
              c._3 + densityMicro, c._4 + energyDu)
            val (nDays, nGood, sumDm, sumEdu) = c2
            (c2, Seq(SiteReportRow(
              site, day, nDays, rnd(cap, 6),
              rnd(nGood.toDouble / nDays, 6),
              ((2 * sumDm + nDays) / (2 * nDays)).toDouble / 1e6,
              ((2 * sumEdu + nDays) / (2 * nDays)).toDouble / 1e4,
              clip)))
        }
      }
    )
  }

  /** Incremental per-site DayStats via `mapGroupsWithState` (SURVEY
    * §2.11: the stateful face — per-site state survives across
    * micro-batches and across restarts through the checkpoint).
    * Each batch emits the site's updated rollup; state is a per-day
    * aggregate map, bounded by days-per-site like the batch path.
    *
    * Run repeatedly with the same `checkpoint` dir: only new files
    * are processed, and per-site state carries over — the streaming
    * twin of the batch `Pipeline.dayStats`.
    */
  def incrementalSiteStats(spark: SparkSession, path: String, checkpoint: String, outDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    // The day key is derived INSIDE the query plan (to_date under the
    // session's UTC timezone), so streaming day attribution matches the
    // batch Pipeline.dayStats twin regardless of the host's default TZ
    // (Timestamp.toString would render in the JVM default zone).
    val evs = readEvents(spark, path)
      // null ts/value guard: the Ev decode is non-nullable, and a single
      // poisoned file would otherwise kill the query on every restart
      .filter(col("ts").isNotNull && col("user_id").isNotNull && col("value").isNotNull)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"), col("value"))
      .as[Ev]
    val updated = evs
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (site: Long, it: Iterator[Ev], state: GroupState[Map[String, (Long, Double, Double)]]) =>
          val old = state.getOption.getOrElse(Map.empty[String, (Long, Double, Double)])
          val upd = it.foldLeft(old) { (m, e) =>
            val (n, s, mx) = m.getOrElse(e.day, (0L, 0.0, Double.MinValue))
            m.updated(e.day, (n + 1, s + e.value, math.max(mx, e.value)))
          }
          state.update(upd)
          SiteAgg(site, upd.size, upd.values.map(_._1).sum, upd.values.map(_._2).sum, upd.values.map(_._3).max)
      }
    val q = updated.toDF().writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent like StreamSink: a replayed batch overwrites its
        // own partition instead of appending duplicate update rows
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }
}
