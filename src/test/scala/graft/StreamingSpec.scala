package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.EventStream

/** Streaming face: batch parquet drives the same windowed aggregation
  * through a real streaming query (AvailableNow + memory sink).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  test("hourly streaming rollup matches the equivalent batch aggregation") {
    // stage a micro-batch dir with timestamps in a stream-readable type
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(dir)

    val streamAgg = EventStream.hourlyStats(EventStream.readEvents(spark, dir), capacityHint = 100.0)
    val got = EventStream.runAvailableNow(spark, streamAgg, "hourly_out")

    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_obs"), sum(col("value")).as("sum_v"))
      .select(col("win.start").as("window_start"), col("user_id"), col("n_obs"), col("sum_v"))

    val g = got.select("window_start", "user_id", "n_obs", "sum_v")
    // append mode emits only watermark-finalized windows: everything
    // emitted must match batch exactly; only tail windows (within the
    // 30-min watermark of the max event time) may be withheld.
    assert(g.except(batch).count() == 0, "streaming emitted rows absent from batch")
    val maxTs = spark.read.parquet(dir).agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - (90 * 60 * 1000L)) // 1h window + 30m watermark
    val missing = batch.except(g)
    assert(missing.filter(col("window_start") < cutoff).count() == 0,
      "batch rows older than the watermark horizon missing from streaming output")
    assert(g.count() >= batch.count() - 20)
  }

  test("finalizedDayStats emits each closed day exactly once, matching batch") {
    val src = java.nio.file.Files.createTempDirectory("evday").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evdayckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("evdayout").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cache()
    val days = all.select("day").distinct().orderBy("day").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val splitDay = days(days.length / 2)

    // batch 1: the first half of the days
    all.filter(col("day") <= splitDay).drop("day").write.mode("append").parquet(src)
    val out1 = EventStream.finalizedDayStats(spark, src, ckpt, outDir)
    // every emitted day is strictly before each site's open day and matches batch exactly
    val batchStats = all
      .groupBy(col("user_id").as("site"), col("day"))
      .agg(count(lit(1)).as("e_n"), sum("value").as("e_sum"))
    val bad1 = out1.join(batchStats, Seq("site", "day"))
      .filter(col("nObs") =!= col("e_n") || abs(col("sumV") - col("e_sum")) > 1e-6)
    assert(bad1.count() == 0, "finalized day stats diverge from batch")
    assert(out1.count() > 0)
    assert(out1.filter(col("day") > splitDay).count() == 0, "emitted a day that was still open")

    // batch 2: the rest arrives — previously-open days close and emit once
    all.filter(col("day") > splitDay).drop("day").write.mode("append").parquet(src)
    val out2 = EventStream.finalizedDayStats(spark, src, ckpt, outDir)
    val dupes = out2.groupBy("site", "day").count().filter(col("count") > 1)
    assert(dupes.count() == 0, "a day was finalized more than once")
    val bad2 = out2.join(batchStats, Seq("site", "day"))
      .filter(col("nObs") =!= col("e_n") || abs(col("sumV") - col("e_sum")) > 1e-6)
    assert(bad2.count() == 0, "cross-batch finalized stats diverge from batch")
    // everything except each site's last (still-open) day is now final
    val expectClosed = batchStats.join(
      batchStats.groupBy("site").agg(max("day").as("last_day")), "site")
      .filter(col("day") < col("last_day"))
    assert(out2.count() == expectClosed.count(),
      s"expected ${expectClosed.count()} closed days, got ${out2.count()}")

    // batch 3: LATE replay of an already-finalized day — the per-site
    // closed-day watermark must drop it, not re-open + re-emit it
    val lateDay = days(1)
    all.filter(col("day") === lateDay).drop("day").write.mode("append").parquet(src)
    val out3 = EventStream.finalizedDayStats(spark, src, ckpt, outDir)
    val dupes3 = out3.groupBy("site", "day").count().filter(col("count") > 1)
    assert(dupes3.count() == 0, "late replay re-emitted an already-finalized day")
    assert(out3.count() == out2.count(), "late replay changed the finalized row count")
  }

  test("incrementalClipStats matches batch clip2 and the expanding clip1") {
    val src = java.nio.file.Files.createTempDirectory("evclip").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evclipckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("evclipout").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cache()
    val days = all.select("day").distinct().orderBy("day").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val splitDay = days(days.length / 2)

    all.filter(col("day") <= splitDay).drop("day").write.mode("append").parquet(src)
    EventStream.incrementalClipStats(spark, src, ckpt, outDir)
    all.filter(col("day") > splitDay).drop("day").write.mode("append").parquet(src)
    val out = EventStream.incrementalClipStats(spark, src, ckpt, outDir)

    // batch twin: per-(site, day) clip2 of every CLOSED day, clip1
    // against the expanding max of closed daily maxes
    import org.apache.spark.sql.expressions.Window
    val daily = all.groupBy(col("user_id").as("site"), col("day"))
      .agg(max("value").as("e_dmax"))
    val evs2 = all.select(col("user_id").as("site"), col("day"), col("value"))
    val sums = evs2.join(daily, Seq("site", "day"))
      .filter(col("e_dmax") > 0)
      .groupBy(col("site"), col("day"))
      .agg(
        first(col("e_dmax")).as("e_dmax"),
        sum(when(col("value") / col("e_dmax") > 0.995, col("value") / col("e_dmax")).otherwise(0.0)).as("num"),
        sum(col("value") / col("e_dmax")).as("den")
      )
      .withColumn("e_clip2", col("num") / col("den"))
    val lastDay = daily.groupBy("site").agg(max("day").as("last_day"))
    val w = Window.partitionBy("site").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val expect = sums.join(lastDay, "site")
      .filter(col("day") < col("last_day"))
      .withColumn("e_site_max", max(col("e_dmax")).over(w))
      .withColumn("e_clip1", col("e_dmax") / col("e_site_max"))
    assert(out.count() == expect.count(), "closed-day row count mismatch")
    val joined = out.join(expect, Seq("site", "day"))
    val bad = joined.filter(
      abs(col("dailyMax") - col("e_dmax")) > 1e-9 ||
        abs(col("clip2") - col("e_clip2")) > 1e-9 ||
        abs(col("clip1SoFar") - col("e_clip1")) > 1e-9)
    assert(bad.count() == 0, "streaming clip stats diverge from the batch twin")
    val dupes = out.groupBy("site", "day").count().filter(col("count") > 1)
    assert(dupes.count() == 0, "a closed day emitted clip stats more than once")
  }

  test("incrementalRiseSet matches the batch rule against the expanding site max") {
    val src = java.nio.file.Files.createTempDirectory("evrs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evrsckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("evrsout").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cache()
    val days = all.select("day").distinct().orderBy("day").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val splitDay = days(days.length / 2)
    all.filter(col("day") <= splitDay).drop("day").write.mode("append").parquet(src)
    EventStream.incrementalRiseSet(spark, src, ckpt, outDir)
    all.filter(col("day") > splitDay).drop("day").write.mode("append").parquet(src)
    val out = EventStream.incrementalRiseSet(spark, src, ckpt, outDir)

    // batch twin: per closed (site, day), first/last hour above
    // 0.05 × expanding max of daily maxes, with the first/last-sample
    // guards, exactly the onClose rule
    import org.apache.spark.sql.expressions.Window
    val h = graft.operators.TimeAxis.hourOfDay(col("ts"))
    val evs2 = all.select(col("user_id").as("site"), col("day"), col("value"), h.as("h"))
    val daily = evs2.groupBy(col("site"), col("day"))
      .agg(max("value").as("e_dmax"), min(col("h")).as("h_first"), max(col("h")).as("h_last"))
    val w = Window.partitionBy("site").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val withThr = daily.withColumn("e_site_max", max(col("e_dmax")).over(w))
      .withColumn("thr", col("e_site_max") * 0.05)
    val lit2 = evs2.join(withThr, Seq("site", "day"))
      .filter(col("value") > col("thr"))
      .groupBy(col("site"), col("day"))
      .agg(min(col("h")).as("lit_min"), max(col("h")).as("lit_max"))
    val lastDay = daily.groupBy("site").agg(max("day").as("last_day"))
    val expect = withThr.join(lit2, Seq("site", "day"), "left")
      .join(lastDay, "site")
      .filter(col("day") < col("last_day"))
      .withColumn("e_rise", when(col("lit_min").isNull || col("lit_min") === col("h_first"),
        lit(Double.NaN)).otherwise(col("lit_min")))
      .withColumn("e_set", when(col("lit_max").isNull || col("lit_max") === col("h_last"),
        lit(Double.NaN)).otherwise(col("lit_max")))
    assert(out.count() == expect.count(), "closed-day row count mismatch")
    val joined = out.join(expect, Seq("site", "day"))
    val bad = joined.filter(
      (!isnan(col("rise_h")) || !isnan(col("e_rise"))) &&
        !(abs(col("rise_h") - col("e_rise")) < 1e-9) ||
        (!isnan(col("set_h")) || !isnan(col("e_set"))) &&
          !(abs(col("set_h") - col("e_set")) < 1e-9))
    assert(bad.count() == 0, s"streaming rise/set diverges from the batch twin")
    val dupes = out.groupBy("site", "day").count().filter(col("count") > 1)
    assert(dupes.count() == 0, "a closed day emitted rise/set more than once")
  }

  test("incrementalLocationDays matches the batch lat/lon day estimates against the expanding max") {
    val src = java.nio.file.Files.createTempDirectory("evloc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evlocckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("evlocout").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cache()
    val days = all.select("day").distinct().orderBy("day").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val splitDay = days(days.length / 2)
    all.filter(col("day") <= splitDay).drop("day").write.mode("append").parquet(src)
    EventStream.incrementalLocationDays(spark, src, ckpt, outDir)
    all.filter(col("day") > splitDay).drop("day").write.mode("append").parquet(src)
    val out = EventStream.incrementalLocationDays(spark, src, ckpt, outDir)

    // batch twin: the onClose arithmetic replayed relationally — dl
    // above 0.05 × expanding max, CoM noon, Cooper/Spencer inversion
    import org.apache.spark.sql.expressions.Window
    val h = graft.operators.TimeAxis.hourOfDay(col("ts"))
    val evs2 = all.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id").as("site"), col("day"), col("value"), h.as("h"))
    val daily = evs2.groupBy(col("site"), col("day"))
      .agg(max("value").as("e_dmax"), sum(col("value")).as("sv"),
        sum(col("h") * col("value")).as("shv"))
    val w = Window.partitionBy("site").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val withThr = daily.withColumn("thr", max(col("e_dmax")).over(w) * 0.05)
    val lit2 = evs2.join(withThr, Seq("site", "day"))
      .filter(col("value") > col("thr"))
      .groupBy(col("site"), col("day"))
      .agg((max(col("h")) - min(col("h"))).as("e_dl"))
    val doy = dayofyear(to_date(col("day")))
    val decl = radians(lit(23.45) * sin(lit(2 * math.Pi) * (lit(284.0) + doy) / lit(365.0)))
    val b = lit(2 * math.Pi) * (doy - 1.0) / lit(365.0)
    val eot = lit(229.18) * (lit(0.000075) + lit(0.001868) * cos(b) - lit(0.032077) * sin(b)
      - lit(0.014615) * cos(lit(2.0) * b) - lit(0.04089) * sin(lit(2.0) * b))
    val lastDay = daily.groupBy("site").agg(max("day").as("last_day"))
    val expect = withThr.join(lit2, Seq("site", "day"), "left")
      .join(lastDay, "site")
      .filter(col("day") < col("last_day"))
      .withColumn("e_com", col("shv") / col("sv"))
      .withColumn("e_lat", degrees(atan(-cos(radians(lit(7.5) * col("e_dl"))) / tan(decl))))
      .withColumn("e_lon", lit(-15.0) * (col("e_com") - lit(12.0) + eot / lit(60.0)))
    assert(out.count() == expect.count(), "closed-day row count mismatch")
    val joined = out.join(expect, Seq("site", "day"))
    // NaN (streaming) pairs with null (batch left-join) when a day has
    // no above-threshold samples or zero energy
    val latOk = (isnan(col("latDay")) && col("e_lat").isNull) ||
      abs(col("latDay") - col("e_lat")) < 1e-6
    val lonOk = (isnan(col("lonDay")) && col("e_lon").isNull) ||
      abs(col("lonDay") - col("e_lon")) < 1e-6
    val bad = joined.filter(!(latOk && lonOk))
    assert(bad.count() == 0, "streaming lat/lon day estimates diverge from the batch twin")
    val dupes = out.groupBy("site", "day").count().filter(col("count") > 1)
    assert(dupes.count() == 0, "a closed day emitted location more than once")
  }

  test("incrementalCapacityJumps matches the batch windowed log-ratio on full-frame days") {
    val src = java.nio.file.Files.createTempDirectory("evcap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evcapckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("evcapout").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cache()
    val days = all.select("day").distinct().orderBy("day").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val splitDay = days(days.length / 2)

    all.filter(col("day") <= splitDay).drop("day").write.mode("append").parquet(src)
    EventStream.incrementalCapacityJumps(spark, src, ckpt, outDir)
    all.filter(col("day") > splitDay).drop("day").write.mode("append").parquet(src)
    val out = EventStream.incrementalCapacityJumps(spark, src, ckpt, outDir)

    // batch twin (q51's windows over CLOSED days), restricted to days
    // whose both frames are complete
    import org.apache.spark.sql.expressions.Window
    val daily = all.groupBy(col("user_id").as("site"), col("day"))
      .agg(log(greatest(max("value"), lit(1e-9))).as("ldm"))
    val lastDay = daily.groupBy("site").agg(max("day").as("last_day"))
    val w = Window.partitionBy("site").orderBy("day")
    val expect = daily.join(lastDay, "site")
      .filter(col("day") < col("last_day")) // closed days only
      .withColumn("n_before", count(lit(1)).over(w.rowsBetween(-7, -1)))
      .withColumn("n_after", count(lit(1)).over(w.rowsBetween(0, 6)))
      .withColumn("e_jump", round(
        avg(col("ldm")).over(w.rowsBetween(0, 6)) - avg(col("ldm")).over(w.rowsBetween(-7, -1)), 6))
      .filter(col("n_before") === 7 && col("n_after") === 7)
    assert(out.count() == expect.count(),
      s"full-frame day count mismatch: ${out.count()} vs ${expect.count()}")
    val joined = out.join(expect, Seq("site", "day"))
    val bad = joined.filter(abs(col("jumpR") - col("e_jump")) > 1e-9)
    assert(bad.count() == 0, "streaming jumps diverge from the batch windows")
    val dupes = out.groupBy("site", "day").count().filter(col("count") > 1)
    assert(dupes.count() == 0, "a day emitted its jump more than once")
  }

  test("incrementalClearDays labels match a batch expanding-envelope computation") {
    val src = java.nio.file.Files.createTempDirectory("evclr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evclrckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("evclrout").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cache()
    val days = all.select("day").distinct().orderBy("day").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val splitDay = days(days.length / 2)

    // two batches through the same checkpoint — labels accumulate append-only
    all.filter(col("day") <= splitDay).drop("day").write.mode("append").parquet(src)
    EventStream.incrementalClearDays(spark, src, ckpt, outDir)
    all.filter(col("day") > splitDay).drop("day").write.mode("append").parquet(src)
    val out = EventStream.incrementalClearDays(spark, src, ckpt, outDir)

    // batch twin: per-(site, day) energy of every CLOSED day (all but
    // each site's last), labeled against the expanding running max
    import org.apache.spark.sql.expressions.Window
    val daily = all.groupBy(col("user_id").as("site"), col("day"))
      .agg((sum("value") * 24.0 / count(lit(1))).as("e_energy"))
    val lastDay = daily.groupBy("site").agg(max("day").as("last_day"))
    val w = Window.partitionBy("site").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val expect = daily.join(lastDay, "site")
      .filter(col("day") < col("last_day"))
      .withColumn("run_max", max(col("e_energy")).over(w))
      .withColumn("e_clear", col("e_energy") >= lit(0.8) * col("run_max"))
    assert(out.count() == expect.count(), "closed-day row count mismatch")
    val joined = out.join(expect, Seq("site", "day"))
    val bad = joined.filter(
      abs(col("energy") - col("e_energy")) > 1e-9 || col("clear") =!= col("e_clear"))
    assert(bad.count() == 0, "streaming clear-day labels diverge from the batch expanding window")
    assert(out.filter(col("clear")).count() > 0, "no clear days labeled at all")
  }

  test("mapGroupsWithState carries per-site state across checkpointed incremental runs") {
    val src = java.nio.file.Files.createTempDirectory("evincr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evckpt").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .cache()

    val outDir = java.nio.file.Files.createTempDirectory("evout").toString

    // batch 1: first half of events
    all.filter(col("event_id") < 500).write.mode("append").parquet(src)
    EventStream.incrementalSiteStats(spark, src, ckpt, outDir)

    // batch 2: the rest arrives; same checkpoint -> only new files read
    all.filter(col("event_id") >= 500).write.mode("append").parquet(src)
    val out2 = EventStream.incrementalSiteStats(spark, src, ckpt, outDir)

    // after the second run, per-site totals must equal the full batch
    val got = out2.groupBy("site").agg(max("nObs").as("nObs"), max("totalV").as("totalV"))
    val expect = all.groupBy(col("user_id").as("site"))
      .agg(count(lit(1)).as("e_n"), sum("value").as("e_sum"))
    val joined = got.join(expect, "site")
    val bad = joined.filter(col("nObs") =!= col("e_n") || abs(col("totalV") - col("e_sum")) > 1e-6).count()
    assert(bad == 0, "incremental state diverged from batch totals")
    assert(got.count() == expect.count())
  }

  test("incrementalSiteReport snapshot equals the relational fleet report over closed days") {
    import graft.operators.DayStats
    val src = java.nio.file.Files.createTempDirectory("evrep").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evrepckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("evrepout").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cache()
    val days = all.select("day").distinct().orderBy("day")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val splitDay = days(days.length / 2)

    // static side: raw p95 capacity from the "last full rebuild",
    // plus an arbitrary deterministic clipping verdict (a passthrough
    // column for the twin)
    val ev = all.filter(col("ts").isNotNull && col("value").isNotNull)
    val capMap: Map[Long, Double] = DayStats.capacity(ev, "user_id", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val static = capMap.map { case (s, c) => s -> (c, s % 3 == 0) }

    all.filter(col("day") <= splitDay).drop("day").write.mode("append").parquet(src)
    EventStream.incrementalSiteReport(spark, src, ckpt, outDir, static)
    all.filter(col("day") > splitDay).drop("day").write.mode("append").parquet(src)
    val out2 = EventStream.incrementalSiteReport(spark, src, ckpt, outDir, static)

    // latest emitted row per site = the current dashboard snapshot
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("site").orderBy(col("as_of").desc)
    val latest = out2.withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")

    // independent RELATIONAL formulation (the batch p07 arithmetic)
    // restricted to each site's closed days (day < the site's max day)
    val cap = DayStats.capacity(ev, "user_id", "value")
      .withColumn("thr", round(col("capacity") * 0.02, 6))
    val lastDay = ev.groupBy("user_id")
      .agg(max(to_date(col("ts")).cast("string")).as("last_day"))
    val dayG = ev.join(broadcast(cap), Seq("user_id"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .join(lastDay, Seq("user_id")).filter(col("day") < col("last_day"))
      .groupBy(col("user_id"), col("day"))
      .agg(
        round(sum(col("value")), 2).as("sum_v"),
        count(lit(1)).as("n_slots"),
        sum(when(col("value") > col("thr"), 1L).otherwise(0L)).as("n_above"),
        avg(col("value")).as("avg_v"),
        first(col("capacity")).as("capacity"))
      .withColumn("energy_du",
        round(round(col("sum_v") * 24.0 / col("n_slots"), 4) * 1e4).cast("long"))
      .withColumn("density_micro",
        round(round(col("n_above").cast("double") / col("n_slots"), 6) * 1e6).cast("long"))
      .withColumn("good_day", col("n_slots") >= 10L && col("avg_v") > 0.0)
    val expect = dayG.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("e_n_days"),
        round(first(col("capacity")), 6).as("e_capacity"),
        sum(when(col("good_day"), 1L).otherwise(0L)).as("n_good"),
        sum(col("density_micro")).as("sum_dm"),
        sum(col("energy_du")).as("sum_edu"))
      .select(
        col("user_id").as("site"), col("e_n_days"), col("e_capacity"),
        round(col("n_good").cast("double") / col("e_n_days"), 6).as("e_quality"),
        (expr("(2 * sum_dm + e_n_days) div (2 * e_n_days)").cast("double") / 1e6)
          .as("e_density"),
        (expr("(2 * sum_edu + e_n_days) div (2 * e_n_days)").cast("double") / 1e4)
          .as("e_energy"))

    val j = latest.join(expect, Seq("site"))
    assert(latest.count() == expect.count(), "snapshot site count diverged from batch")
    val bad = j.filter(
      col("n_days") =!= col("e_n_days") ||
      col("capacity") =!= col("e_capacity") ||
      abs(col("quality_score") - col("e_quality")) > 1e-9 ||
      abs(col("mean_density") - col("e_density")) > 1e-9 ||
      abs(col("mean_energy") - col("e_energy")) > 1e-9)
    assert(bad.count() == 0, "streaming report snapshot diverged from the relational report")
    // clipping verdict is a faithful passthrough of the injected rebuild column
    val badClip = latest.filter(col("inverter_clipping") =!= (col("site") % 3 === 0))
    assert(badClip.count() == 0, "clipping verdict passthrough diverged")

    // late replay of an already-closed day must not re-emit or shift the report
    val lateDay = days(1)
    all.filter(col("day") === lateDay).drop("day").write.mode("append").parquet(src)
    val out3 = EventStream.incrementalSiteReport(spark, src, ckpt, outDir, static)
    assert(out3.count() == out2.count(), "late replay changed the report ticker length")

    // a site missing from the rebuild static table is withheld, not misreported
    val someSite = capMap.keys.head
    val src2 = java.nio.file.Files.createTempDirectory("evrep2").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("evrep2ckpt").toString
    val outDir2 = java.nio.file.Files.createTempDirectory("evrep2out").toString
    all.drop("day").write.mode("append").parquet(src2)
    val outHeld = EventStream.incrementalSiteReport(
      spark, src2, ckpt2, outDir2, static - someSite)
    assert(outHeld.filter(col("site") === someSite).count() == 0,
      "uncalibrated site leaked into the report")
    assert(outHeld.count() > 0)
  }

  test("incrementalSensorMoments closed-day rows are bit-equal to SensorId.dayMoments across a restart") {
    import org.apache.spark.sql.DataFrame
    val src = java.nio.file.Files.createTempDirectory("evsens").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evsensckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("evsensout").toString
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cache()
    val days = all.select("day").distinct().orderBy("day")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val splitDay = days(days.length / 2)
    all.filter(col("day") <= splitDay).drop("day").write.mode("append").parquet(src)
    EventStream.incrementalSensorMoments(spark, src, ckpt, outDir)
    all.filter(col("day") > splitDay).drop("day").write.mode("append").parquet(src)
    val out = EventStream.incrementalSensorMoments(spark, src, ckpt, outDir)

    // batch grain over the SAME hour-derived sensors, closed days only
    val h = graft.operators.TimeAxis.hourOfDay(col("ts"))
    val fleet = all
      .withColumn("s_tri", greatest(lit(0.0), lit(12.0) - abs(h - lit(12.0))) * lit(75.0))
      .withColumn("s_lin", h * lit(40.0))
    val batch: DataFrame = graft.analyses.SensorId.dayMoments(
        fleet, "user_id", "ts", "value", Seq("s_tri", "s_lin"),
        errorDayPredicate = col("event_type") === "error")
      .withColumn("day", col("day").cast("string"))
    val lastDay = batch.groupBy("site").agg(max("day").as("last_day"))
    val expect = batch.join(lastDay, "site").filter(col("day") < col("last_day"))
      .drop("last_day")
    assert(out.count() == expect.count(),
      s"closed-day row count: stream ${out.count()} vs batch ${expect.count()}")
    // integer moments must match EXACTLY (bit-equal lifts + order-free sums)
    val keys = Seq("site", "day", "sensor")
    val joined = out.join(expect.withColumnsRenamed(
      Map("n" -> "e_n", "sy" -> "e_sy", "syy" -> "e_syy", "err" -> "e_err",
        "sx" -> "e_sx", "sxx" -> "e_sxx", "sxy" -> "e_sxy")), keys)
    assert(joined.count() == out.count(), "stream emitted a (site, day, sensor) batch lacks")
    val bad = joined.filter(
      col("n") =!= col("e_n") || col("sy") =!= col("e_sy") || col("syy") =!= col("e_syy") ||
        col("err") =!= col("e_err") || col("sx") =!= col("e_sx") ||
        col("sxx") =!= col("e_sxx") || col("sxy") =!= col("e_sxy"))
    assert(bad.count() == 0, "streaming moments diverged from the batch grain")
  }
}
