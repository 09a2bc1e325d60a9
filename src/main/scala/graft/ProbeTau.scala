package graft

import org.apache.spark.sql.functions._

/** Same-JVM A/B probe for the SCSF fit lane (optimization round 13):
  * times the 3-tau estimateAndDetect form against the single-tau
  * estimateSingle form, and the fused undilate2 PI against the
  * two-branch join form, interleaved in one session so JIT/host drift
  * cancels. Usage: runMain graft.ProbeTau [sfDir]
  */
object ProbeTau {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id").as("site"), col("ts"), col("value"))
    val dil = graft.operators.Dilation.dilate(spark, ev, "site", "ts", "value", 40)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probetau] $label ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    // the round-13 shipped single-tau lane (generic ((site,day,slot),
    // Tuple4) shuffle rows, per-site Tuple4 buffering, day→offset hash
    // map) — the A/B baseline for the round-14 DilRow primitive lane
    def oldLane1tau(nBins: Int, tau: Double): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val harmonicsDaily = 3; val harmonicsYearly = 2
      val rows = dil
        .select(
          col("site").cast("long"), col("day").cast("string"),
          col("dil_slot").cast("int"), col("dil_value").cast("double")
        )
        .as[(Long, String, Int, Double)]
      val par = spark.sparkContext.defaultParallelism
      val solved = rows.rdd
        .map(r => ((r._1, r._2, r._3), r))
        .repartitionAndSortWithinPartitions(new org.apache.spark.Partitioner {
          override def numPartitions: Int = par
          override def getPartition(key: Any): Int = {
            val h = key.asInstanceOf[(Long, String, Int)]._1.hashCode
            ((h % par) + par) % par
          }
        })
        .mapPartitions { part =>
          val rowsIt = part.map(_._2).buffered
          new Iterator[Array[(Long, String, Int, Double)]] {
            override def hasNext: Boolean = rowsIt.hasNext
            override def next(): Array[(Long, String, Int, Double)] = {
              val siteId = rowsIt.head._1
              val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int, Double)]
              while (rowsIt.hasNext && rowsIt.head._1 == siteId) buf += rowsIt.next()
              buf.toArray
            }
          }.flatMap { pts =>
            val siteId = pts(0)._1
            val days = pts.map(_._2).distinct
            val day0 = java.time.LocalDate.parse(days.head).toEpochDay
            val dayOff = days.map(d =>
              (java.time.LocalDate.parse(d).toEpochDay - day0).toDouble).zip(days).map(_.swap).toMap
            val t = pts.map(p => dayOff(p._2) * nBins.toDouble + p._3)
            val y = pts.map(_._4)
            val bases = Seq((nBins.toDouble, harmonicsDaily), (365.2425 * nBins, harmonicsYearly))
            val fit = graft.solvers.Kernels.quantileFourierFitMultiTaus(y, t, Seq(tau), bases).head
            pts.indices.iterator.map { i =>
              (siteId, pts(i)._2, pts(i)._3, y(i), fit(i))
            }
          }
        }
      spark.createDataset(solved)
        .toDF("site", "day", "dil_slot", "dil_value", "q_fit")
    }

    // lane-rework parity: the DilRow lane hands the SAME (t, y) arrays
    // in the SAME order to the same kernel, so q_fit must be
    // bit-identical to the round-13 tuple lane
    val laneMism = graft.analyses.Quantiles.estimateSingle(spark, dil, 40, tau = 0.9)
      .join(oldLane1tau(40, 0.9).select(col("site"), col("day"), col("dil_slot"),
          col("dil_value").as("dv0"), col("q_fit").as("fit0")),
        Seq("site", "day", "dil_slot"), "full")
      .filter(col("dil_value") =!= col("dv0") || col("q_fit") =!= col("fit0") ||
        col("dil_value").isNull =!= col("dv0").isNull ||
        col("q_fit").isNull =!= col("fit0").isNull)
      .count()
    println(s"[probetau] lane rework mismatches (old tuple lane vs DilRow lane): $laneMism (must be 0)")

    (1 to 3).foreach { rep =>
      System.gc()
      time(s"fit3tau rep$rep") {
        graft.analyses.Quantiles.estimateAndDetect(spark, dil, 40, tauHi = 0.9).count()
      }
      System.gc()
      time(s"fit1tau-oldlane rep$rep")(oldLane1tau(40, 0.9).count())
      System.gc()
      time(s"fit1tau rep$rep") {
        graft.analyses.Quantiles.estimateSingle(spark, dil, 40, tau = 0.9).count()
      }
    }

    // PI surface: the round-12 two-branch join form vs the fused
    // undilate2 form (both over the SAME single-tau fit, so this
    // isolates the undilate fusion from the tau change)
    val dh = new DataHandler(ev, "site", "ts", "value")
    val rs = graft.operators.Dilation.riseSetTable(ev, "site", "ts", "value")
    def oldPi(): Long = {
      val fit = dh.fitStatisticalClearSky(0.9, 40)
      def und(c: org.apache.spark.sql.Column, as: String) =
        graft.operators.Dilation.undilate(
          spark, fit.select(col("site"), col("day"), col("dil_slot"), c.as("dil_value")),
          rs, 288)
          .groupBy(col("site"), col("day"))
          .agg(sum(col("value")).as(as))
      und(col("dil_value"), "measured_energy")
        .join(und(col("scsf"), "clear_energy"), Seq("site", "day"))
        .withColumn("scsf_pi", try_divide(col("measured_energy"), col("clear_energy")))
        .count()
    }
    (1 to 3).foreach { rep =>
      System.gc()
      time(s"pi2branch rep$rep")(oldPi())
      System.gc()
      time(s"pifused rep$rep")(dh.scsfPerformanceIndex(0.9, 40).count())
    }
    spark.stop()
  }
}
