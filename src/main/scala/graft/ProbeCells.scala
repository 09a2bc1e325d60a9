package graft

import org.apache.spark.sql.functions._

/** Same-JVM A/B probe for the orientationCells shape (optimization
  * round 13): the round-12 form (separate noon/lat aggregations, noon
  * broadcast-joined at ROW grain) vs the fused form (one site-grain
  * aggregation, noon+lat attached after the cell aggregate), on the
  * raw (q63) and filled (q66) inputs. Usage: runMain graft.ProbeCells
  */
object ProbeCells {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    import graft.operators.{DayStats, SideJoin, TimeAxis}
    import graft.functions.Solar
    val DegToRad = 0.017453292519943295
    val RadToDeg = 57.29577951308232

    def oldCells(df: org.apache.spark.sql.DataFrame, site: String, tsCol: String,
        valueCol: String): org.apache.spark.sql.DataFrame = {
      val eotH = Solar.equationOfTimeMin(dayofyear(to_date(col(tsCol)))) / lit(60.0)
      val rs = DayStats.riseSetRough(df, site, tsCol, valueCol, 0.01)
        .withColumn("__eot_h", Solar.equationOfTimeMin(dayofyear(col("day"))) / lit(60.0))
      val noon = rs.groupBy(col(site)).agg(
        percentile((col("sunrise_h") + col("sunset_h")) / 2.0 + col("__eot_h"), lit(0.5))
          .as("__noon"))
      val declRad = Solar.declinationDeg(dayofyear(col("day"))) * lit(DegToRad)
      val lat = rs.withColumn("__lat_day",
          atan(-cos(lit(7.5) * col("daylight_h") * lit(DegToRad)) / tan(declRad)) * lit(RadToDeg))
        .groupBy(col(site))
        .agg(percentile(col("__lat_day"), lit(0.5)).as("lat_est"))
      val cap = df.groupBy(col(site))
        .agg(percentile(col(valueCol), lit(0.99)).as("__cap"))
      val h = TimeAxis.hourOfDay(col(tsCol)) + eotH
      val cells = SideJoin.back(SideJoin.back(df, cap, Seq(site)), noon, Seq(site))
        .select(
          col(site).cast("string").as("__site"),
          dayofyear(to_date(col(tsCol))).as("doy"),
          floor(h).cast("int").as("hslot"),
          (col(valueCol) / col("__cap")).as("np"),
          col("__noon").as("noon"))
        .groupBy(col("__site"), col("doy"), col("hslot"))
        .agg(max(col("np")).as("ct"), first(col("noon")).as("noon"))
      cells
        .join(broadcast(lat.select(col(site).cast("string").as("__site"), col("lat_est"))),
          Seq("__site"))
        .select(col("__site"), col("doy"), col("hslot"), col("ct"), col("noon"), col("lat_est"))
    }

    // the round-13 shipped form (one fused noon+lat site aggregation,
    // noon attached post-cell-agg, but still FOUR row-grain passes:
    // rise/set threshold max, rise/set day agg, p99 capacity, cells) —
    // the A/B baseline for the round-14 two-pass fusion
    def midCells(df: org.apache.spark.sql.DataFrame, site: String, tsCol: String,
        valueCol: String): org.apache.spark.sql.DataFrame = {
      val eotH = Solar.equationOfTimeMin(dayofyear(to_date(col(tsCol)))) / lit(60.0)
      val rs = DayStats.riseSetRough(df, site, tsCol, valueCol, 0.01)
        .withColumn("__eot_h", Solar.equationOfTimeMin(dayofyear(col("day"))) / lit(60.0))
      val declRad = Solar.declinationDeg(dayofyear(col("day"))) * lit(DegToRad)
      val noonLat = rs
        .withColumn("__lat_day",
          atan(-cos(lit(7.5) * col("daylight_h") * lit(DegToRad)) / tan(declRad)) * lit(RadToDeg))
        .groupBy(col(site))
        .agg(
          percentile((col("sunrise_h") + col("sunset_h")) / 2.0 + col("__eot_h"), lit(0.5))
            .as("__noon"),
          percentile(col("__lat_day"), lit(0.5)).as("lat_est"))
      val cap = df.groupBy(col(site))
        .agg(percentile(col(valueCol), lit(0.99)).as("__cap"))
      val h = TimeAxis.hourOfDay(col(tsCol)) + eotH
      val cells = SideJoin.back(df, cap, Seq(site))
        .select(
          col(site).cast("string").as("__site"),
          dayofyear(to_date(col(tsCol))).as("doy"),
          floor(h).cast("int").as("hslot"),
          (col(valueCol) / col("__cap")).as("np"))
        .groupBy(col("__site"), col("doy"), col("hslot"))
        .agg(max(col("np")).as("ct"))
      cells
        .join(broadcast(noonLat.select(col(site).cast("string").as("__site"),
          col("__noon").as("noon"), col("lat_est"))), Seq("__site"))
        .select(col("__site"), col("doy"), col("hslot"), col("ct"), col("noon"), col("lat_est"))
    }

    val ev = graft.sources.Tables.events(spark, dir)
    val filled = graft.analyses.Study.filledAsEvents(ev, "user_id", "ts", "value", 48)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probecells] $label ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    // result parity first (count of mismatched rows must be 0)
    val a = oldCells(ev, "user_id", "ts", "value")
    val b = graft.analyses.Profiler.orientationCells(spark, ev, "user_id", "ts", "value")
    val mism = a.withColumnRenamed("ct", "ct0").withColumnRenamed("noon", "noon0")
      .withColumnRenamed("lat_est", "lat0")
      .join(b, Seq("__site", "doy", "hslot"), "full")
      .filter(col("ct0") =!= col("ct") || col("noon0") =!= col("noon") ||
        col("lat0") =!= col("lat_est") ||
        col("ct0").isNull =!= col("ct").isNull)
      .count()
    println(s"[probecells] mismatches raw: $mism (must be 0)")
    (1 to 3).foreach { rep =>
      System.gc()
      time(s"old raw rep$rep")(oldCells(ev, "user_id", "ts", "value").count())
      System.gc()
      time(s"mid raw rep$rep")(midCells(ev, "user_id", "ts", "value").count())
      System.gc()
      time(s"new raw rep$rep")(
        graft.analyses.Profiler.orientationCells(spark, ev, "user_id", "ts", "value").count())
      System.gc()
      time(s"old filled rep$rep")(oldCells(filled, "user_id", "ts", "value").count())
      System.gc()
      time(s"mid filled rep$rep")(midCells(filled, "user_id", "ts", "value").count())
      System.gc()
      time(s"new filled rep$rep")(
        graft.analyses.Profiler.orientationCells(spark, filled, "user_id", "ts", "value").count())
    }
    spark.stop()
  }
}
