package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.SensorId

/** Sensor identification facade: the true irradiance sensor must win
  * the CV under every filter, scores must be deterministic algebra,
  * and the disagreement path must flag inconsistency.
  */
class SensorIdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  /** 3 sites × 60 days × 24 h; power = 2 + 3·irr + deterministic
    * pseudo-noise; s_good = irr, s_noisy = irr + big scrambled noise,
    * s_bad = pure hash noise.
    */
  private lazy val fleet: DataFrame = {
    val rows = for {
      site <- 0 until 3
      d <- 0 until 60
      h <- 0 until 24
    } yield {
      val irr = math.max(0.0, 12.0 - math.abs(h - 12.0)) * 80.0
      val e = (site * 100000 + d * 100 + h).toLong
      def hn(salt: Long): Double = (((e * 2654435761L + salt) % 1000) - 500) / 500.0
      val power = 2.0 + 3.0 * irr + hn(7) * 5.0
      (site.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00").toInstant
        .plusSeconds(d * 86400L), power, irr, irr + hn(13) * 400.0, hn(29) * 700.0)
    }
    rows.toDF("site", "ts", "power", "s_good", "s_noisy", "s_bad")
  }

  test("true sensor wins every filter; scores ordered; corr near 1") {
    val flags = fleet.select(col("site"), to_date(col("ts")).as("day"))
      .distinct()
      // deterministic alternating clear/cloudy days
      .withColumn("clear", dayofmonth(col("day")) % 2 === 0)
    val res = SensorId.identify(fleet, "site", "ts", "power",
      Seq("s_good", "s_noisy", "s_bad"), dayFlags = Some(flags), nSplits = 5)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getString(2)),
        (r.getDouble(5), r.getDouble(6))))
      .toMap
    for (site <- 0L until 3L; f <- Seq("no_errors", "clear", "cloudy")) {
      val (cG, rG) = res((site, "s_good", f))
      val (_, rN) = res((site, "s_noisy", f))
      val (_, rB) = res((site, "s_bad", f))
      assert(cG > 0.99, s"site $site $f: corr(good) = $cG")
      assert(rG < rN && rN < rB, s"site $site $f: rmse order broke ($rG, $rN, $rB)")
    }
    val chosen = SensorId.choose(
      SensorId.identify(fleet, "site", "ts", "power",
        Seq("s_good", "s_noisy", "s_bad"), dayFlags = Some(flags), nSplits = 5))
      .collect()
    assert(chosen.length == 3)
    chosen.foreach { r =>
      assert(r.getString(1) == "s_good" && r.getBoolean(2),
        s"site ${r.getLong(0)} chose ${r.getString(1)} consistent=${r.getBoolean(2)}")
    }
  }

  test("huber face: outlier train days are downweighted — robust fit beats OLS on clean test folds") {
    // y = 2x + 1 exactly, except one gross level-shifted day early in
    // the series (train-side for every test fold). The least-squares
    // face absorbs it into the fit and mispredicts every clean test
    // day; the Huber face's winsorized-scale IRLS downweights that day
    // to irrelevance and recovers the true line EXACTLY.
    val rows = for { d <- 1 to 40; h <- 0 until 8 } yield {
      val x = (d % 13) * 0.5 + h * 0.25
      val y = 2.0 * x + 1.0 + (if (d == 2) 20.0 else 0.0)
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 0$h:15:00").toInstant
        .plusSeconds((d - 1) * 86400L), y, x)
    }
    val df = rows.toDF("site", "ts", "power", "sx")
    val ols = SensorId.identify(df, "site", "ts", "power", Seq("sx"), nSplits = 4)
      .collect().head.getDouble(6)
    val hub = SensorId.identifyHuber(df, "site", "ts", "power", Seq("sx"), nSplits = 4)
      .collect().head.getDouble(6)
    assert(hub < ols / 3.0, s"huber cv_rmse $hub should beat OLS $ols decisively")
    assert(hub < 0.01, s"huber cv_rmse $hub should recover the exact line")
    // same output contract as the relational face
    val cols = SensorId.identifyHuber(df, "site", "ts", "power", Seq("sx"), nSplits = 4).columns
    assert(cols.toSeq == Seq("site", "sensor", "filter", "n_days", "n_obs", "corr", "cv_rmse", "cv_mbe"))
    // determinism across partitionings (in-task day-ordered folds)
    val again = SensorId.identifyHuber(df.repartition(7), "site", "ts", "power", Seq("sx"), nSplits = 4)
      .collect().head.getDouble(6)
    assert(again == hub, s"huber face must be partition-independent ($again vs $hub)")
  }

  test("huber face: degenerate train split disqualifies (null score), like the relational face") {
    val rows = for { d <- 1 to 12; h <- 0 until 4 } yield {
      // sensor constant over the first half of the axis: every train
      // split for early test folds has zero variance
      val x = if (d <= 8) 1.0 else d * 0.5
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 0$h:15:00").toInstant
        .plusSeconds((d - 1) * 86400L), d + h * 0.5, x)
    }
    val df = rows.toDF("site", "ts", "power", "sx")
    val r = SensorId.identifyHuber(df, "site", "ts", "power", Seq("sx"), nSplits = 2)
      .collect().head
    assert(r.isNullAt(6) && r.isNullAt(7), s"degenerate split must null the scores: $r")
  }

  test("filter disagreement flags inconsistent and nulls the choice") {
    // s_a fits clear days perfectly but is garbage on cloudy days;
    // s_b is a uniform mediocre fit — the filters must disagree
    val rows = for {
      d <- 0 until 40
      h <- 0 until 24
    } yield {
      val clearDay = d % 2 == 0
      val irr = math.max(0.0, 12.0 - math.abs(h - 12.0)) * 50.0
      val e = (d * 100 + h).toLong
      def hn(salt: Long): Double = (((e * 2654435761L + salt) % 1000) - 500) / 500.0
      val power = 10.0 + 2.0 * irr + hn(3) * 2.0
      val sA = if (clearDay) irr + hn(5) * 1.0 else hn(11) * 600.0
      val sB = irr + hn(17) * 120.0
      (1L, java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:00:00").toInstant
        .plusSeconds(d * 86400L), power, sA, sB)
    }
    val df = rows.toDF("site", "ts", "power", "s_a", "s_b")
    val flags = df.select(col("site"), to_date(col("ts")).as("day")).distinct()
      .withColumn("clear", (datediff(col("day"), lit("2024-03-01")) % 2) === 0)
    val out = SensorId.choose(SensorId.identify(df, "site", "ts", "power",
      Seq("s_a", "s_b"), dayFlags = Some(flags), nSplits = 4)).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(4) == "s_a", "clear filter should prefer the clear-sky sensor")
    assert(r.getString(5) == "s_b", "cloudy filter should prefer the uniform sensor")
    assert(!r.getBoolean(2) && r.isNullAt(1), "disagreement must null the chosen sensor")
  }

  test("error days drop from no_errors only; no flags → no_errors only") {
    val base = fleet.withColumn("etype",
      when(to_date(col("ts")) === lit("2024-01-03"), lit("error")).otherwise(lit("ok")))
    val res = SensorId.identify(base, "site", "ts", "power", Seq("s_good"),
      errorDayPredicate = col("etype") === "error", nSplits = 5)
    val byFilter = res.groupBy(col("filter")).agg(max(col("n_days")).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFilter.keySet == Set("no_errors"))
    assert(byFilter("no_errors") == 59, s"error day not excluded: ${byFilter("no_errors")}")
  }

  test("a degenerate (constant) train fold disqualifies the sensor — null score, loses the choice") {
    // s_dead is EXACTLY constant for the first 20 days (integer value,
    // so the integer-micro moments make the train determinant exactly
    // zero) and varies afterwards; pooling only its healthy folds
    // would hand it a finite — and unfairly small — cv_rmse
    val rows = for { d <- 0 until 30; h <- 0 until 4 } yield {
      val irr = 10.0 + h * 3.0 + d % 5
      val dead = if (d < 20) 2.0 else irr * 0.5
      (1L, java.sql.Timestamp.valueOf(f"2024-05-01 ${8 + h}%02d:00:00").toInstant
        .plusSeconds(d * 86400L), 1.0 + 2.0 * irr, irr, dead)
    }
    val df = rows.toDF("site", "ts", "power", "s_live", "s_dead")
    val res = SensorId.identify(df, "site", "ts", "power",
      Seq("s_live", "s_dead"), nSplits = 4)
      .collect().map(r => r.getString(1) -> (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(res("s_dead").isEmpty, "degenerate folds must null the score, not shrink the pool")
    assert(res("s_live").isDefined)
    val chosen = SensorId.choose(SensorId.identify(df, "site", "ts", "power",
      Seq("s_live", "s_dead"), nSplits = 4)).collect()(0)
    assert(chosen.getString(1) == "s_live", s"chose ${chosen.getString(1)}")
  }
}
