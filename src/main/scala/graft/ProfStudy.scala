package graft

import org.apache.spark.sql.functions._

/** Dev-only stage timer for the filled-matrix study path (q64/q65):
  * times each composition stage in isolation to locate the cost.
  */
object ProfStudy {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Tables.events(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profstudy] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("warmup count")(ev.count())
    time("filledDayGrid(48) cold") {
      graft.operators.Filling.filledDayGrid(ev, "user_id", "ts", "value", 48).count()
    }
    time("filledDayGrid(48) warm") {
      graft.operators.Filling.filledDayGrid(ev, "user_id", "ts", "value", 48).count()
    }
    // replicate the internals to locate the cost
    locally {
      import graft.operators.{DayStats, SideJoin, TimeAxis}
      val site = "user_id"; val tsCol = "ts"; val valueCol = "value"; val slotsPerDay = 48
      val freqS = 86400 / slotsPerDay
      val slotted0 = ev.groupBy(
        col(site).as("site"), to_date(col(tsCol)).as("day"),
        (TimeAxis.secondsOfDay(col(tsCol)) / freqS).cast("int").as("slot"))
        .agg(avg(col(valueCol)).as("raw"))
      time("  slotted agg")(slotted0.count())
      val slottedRdd = slotted0.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  slotted rdd materialize")(slottedRdd.count())
      val slotted = spark.createDataFrame(slottedRdd, slotted0.schema)
      val cap = DayStats.capacity(ev, site, valueCol).withColumnRenamed(site, "site")
      time("  capacity")(cap.count())
      val rough0 = SideJoin.back(slotted, cap, Seq("site"))
        .groupBy(col("site"), col("day"))
        .agg(
          min(when(col("raw") > col("capacity") * 0.005, col("slot"))).as("sr_rough"),
          max(when(col("raw") > col("capacity") * 0.005, col("slot"))).as("ss_rough"))
      val roughRdd = rough0.rdd.persist()
      time("  rough rdd")(roughRdd.count())
      val rough = spark.createDataFrame(roughRdd, rough0.schema)
      val riseSet = SideJoin.back(
          rough.select(col("site"), col("day")),
          rough.select(col("site"), col("day").as("day2"), col("sr_rough"), col("ss_rough")),
          Seq("site"))
        .filter(abs(datediff(col("day2"), col("day"))) <= 7)
        .groupBy(col("site"), col("day"))
        .agg(
          floor(percentile(col("sr_rough"), lit(0.5))).cast("int").as("sr_s"),
          floor(percentile(col("ss_rough"), lit(0.5))).cast("int").as("ss_s"))
      time("  riseSet ±7 median")(riseSet.count())
      val grid = riseSet.select(col("site"), col("day"), col("sr_s"), col("ss_s"),
        explode(sequence(lit(0), lit(slotsPerDay - 1))).as("slot"))
      val night = col("slot") < col("sr_s") || col("slot") > col("ss_s")
      val base = grid.join(slotted, Seq("site", "day", "slot"), "left")
        .withColumn("__v",
          when(col("raw").isNotNull, greatest(col("raw"), lit(0.0)))
            .when(night, lit(0.0)))
      time("  grid+join")(base.count())
      time("  interpolate") {
        graft.operators.Filling.interpolateLinear(base, Seq("site", "day"), "slot", "__v", "filled")
          .count()
      }
    }
    time("clearDay.detect(96)") {
      graft.analyses.ClearDay.detect(spark, ev, "user_id", "ts", "value", 96).count()
    }
    time("dayGrain(filled only)") {
      graft.analyses.Study.dayGrain(spark, ev, "user_id", "ts", "value",
        includeFilled = true, filledSlotsPerDay = 48, includeRaw = false).count()
    }
    locally {
      val f0 = graft.operators.Filling.filledDayGrid(ev, "user_id", "ts", "value", 48)
        .select(
          col("site").cast("long").as("site"), col("day"),
          (col("slot") * lit(1800.0)).as("sec"),
          col("filled").as("v"),
          lit(0.5).as("freq_h"))
      val fDf = f0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  fDf materialize (columnar)")(fDf.count())
      val rows = fDf.withColumn("data_matrix", lit("filled"))
      time("  rows re-read from df cache")(rows.count())
      val scale = rows.groupBy(col("site"), col("data_matrix"))
        .agg(
          percentile(col("v"), lit(0.99)).as("hi99"),
          min(col("v")).as("mn"),
          percentile(col("v"), lit(0.95)).as("p95"),
          percentile(col("v"), lit(0.05)).as("p05"))
      time("  scale percentiles")(scale.count())
      val j = rows.join(broadcast(scale), Seq("site", "data_matrix"))
        .withColumn("sc_d", round((col("v") - col("mn")) / col("hi99"), 6))
      time("  join+scale+dayagg") {
        j.groupBy(col("site"), col("data_matrix"), col("day"))
          .agg(min(when(col("sc_d") > 0.001, col("sec"))).as("x"))
          .count()
      }
    }
    time("latitudeStudy(filled only)") {
      graft.analyses.Study.latitudeStudy(spark, ev, "user_id", "ts", "value",
        includeFilled = true, filledSlotsPerDay = 48, includeRaw = false).count()
    }
    // exchange-reuse experiment: a repartition on the filled rows
    // gives both perDay consumers one shared Exchange to reuse
    locally {
      val f0 = graft.operators.Filling.filledDayGrid(ev, "user_id", "ts", "value", 48)
        .select(col("site").cast("long").as("site"), col("day"),
          (col("slot") * lit(1800.0)).as("sec"), col("filled").as("v"),
          lit(0.5).as("freq_h"))
        .withColumn("data_matrix", lit("filled"))
        .repartition(col("site"))
      val scale = f0.groupBy(col("site"), col("data_matrix"))
        .agg(percentile(col("v"), lit(0.99)).as("hi99"),
          min(col("v")).as("mn"),
          percentile(col("v"), lit(0.95)).as("p95"),
          percentile(col("v"), lit(0.05)).as("p05"))
      val j = f0.join(broadcast(scale), Seq("site", "data_matrix"))
        .withColumn("sc_d", round((col("v") - col("mn")) / col("hi99"), 6))
      time("  repartition+reuse dayagg") {
        j.groupBy(col("site"), col("data_matrix"), col("day"))
          .agg(min(when(col("sc_d") > 0.001, col("sec"))).as("x"))
          .count()
      }
    }
    spark.stop()
  }
}
