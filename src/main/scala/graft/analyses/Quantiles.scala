package graft.analyses

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.solvers.Kernels

/** Smooth periodic quantile estimation + clear-sky detection on the
  * dilated grain (reference §3.3 lifecycle: `PVQuantiles`
  * `algorithms/quantile_estimation.py:20-94` and `detect_clear_sky`
  * `data_handler.py:2396-2465`).
  *
  * Input is the output of [[graft.operators.Dilation.dilate]] —
  * (site, day, dil_slot, dil_value) — so per-site state is bounded at
  * nBins·num_days doubles regardless of raw scan rate. Each site fits
  * a 2-period Fourier quantile model (daily period = the dilated
  * grid, yearly period = 365.2425 days) per requested tau, then runs
  * the 2-state Viterbi DP on the value/q-hi ratio to label clear
  * periods.
  */
object Quantiles {

  /** @param crossBasis false (default) fits the additive 2-period
    *                    Fourier model — the throughput choice for the
    *                    fleet pipeline; true fits the full spcqe-style
    *                    cross-product basis ([[Kernels.quantileCrossFit]],
    *                    golden-matched to the reference solver in
    *                    `GoldenQuantileSpec`) where the daily profile
    *                    shape modulates across the season.
    * @return (site, day, dil_slot, dil_value, q_lo, q_mid, q_hi, clear)
    */
  def estimateAndDetect(
      spark: SparkSession,
      dilated: DataFrame,
      nBins: Int = 100,
      tauLo: Double = 0.1,
      tauMid: Double = 0.5,
      tauHi: Double = 0.9,
      harmonicsDaily: Int = 3,
      harmonicsYearly: Int = 2,
      crossBasis: Boolean = false
  ): DataFrame = {
    import spark.implicits._
    val rows = dilated
      .select(
        col("site").cast("long"), col("day").cast("string"),
        col("dil_slot").cast("int"), col("dil_value").cast("double")
      )
      .as[(Long, String, Int, Double)]
    // CPU-dense per-site solver stage: pin parallelism with a fixed
    // HashPartitioner RDD shuffle (AQE would coalesce the Dataset
    // groupByKey by byte size; see analyses.Pipeline.run)
    val par = spark.sparkContext.defaultParallelism
    // sites hash-partitioned with (day, slot) secondary sort: the task
    // streams one site at a time (memory O(one site's grid), not
    // O(sites-per-partition))
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
        val days = pts.map(_._2).distinct // sorted by the shuffle's secondary sort
        // CALENDAR day offsets, not observed-day ranks: a data gap
        // must advance the yearly-period phase, or every post-gap day
        // evaluates the seasonal basis out of phase
        val day0 = java.time.LocalDate.parse(days.head).toEpochDay
        val dayOff = days.map(d =>
          (java.time.LocalDate.parse(d).toEpochDay - day0).toDouble).zip(days).map(_.swap).toMap
        val t = pts.map(p => dayOff(p._2) * nBins.toDouble + p._3)
        val y = pts.map(_._4)
        val bases = Seq((nBins.toDouble, harmonicsDaily), (365.2425 * nBins, harmonicsYearly))
        val Seq(lo, mid, hi) =
          if (crossBasis)
            Seq(tauLo, tauMid, tauHi).map(tau =>
              Kernels.quantileCrossFit(y, t, tau, nBins.toDouble, harmonicsDaily,
                365.2425 * nBins, harmonicsYearly))
          else
            // one shared trig design for all three quantile levels
            Kernels.quantileFourierFitMultiTaus(y, t, Seq(tauLo, tauMid, tauHi), bases)
        val ratio = y.indices.map { i =>
          if (hi(i) > 1e-9) y(i) / hi(i) else Double.NaN
        }.toArray
        val clear = Kernels.viterbi2(ratio)
        pts.indices.iterator.map { i =>
          (siteId, pts(i)._2, pts(i)._3, y(i), lo(i), mid(i), hi(i), clear(i))
        }
        }
      }
    spark.createDataset(solved)
      .toDF("site", "day", "dil_slot", "dil_value", "q_lo", "q_mid", "q_hi", "clear")
  }

  /** ONE quantile level, no clear-sky DP — the fit
    * [[graft.DataHandler.fitStatisticalClearSky]] consumes (it selects
    * only `q_hi`, and its gated consumers — q94/q98 — gate the fit
    * through FINITENESS and grain, never through its bits). Fitting
    * only the requested tau skips ~2/3 of the IRLS work and the
    * Viterbi pass (optimization round 13; same-JVM interleaved A/B at
    * sf0.1/40 bins: 2.9–3.1 s → 2.2–2.3 s warm, ProbeTau). The
    * fitted values differ from the 3-tau path in
    * the IRLS convergence tail only (that path warm-starts each tau
    * from the previous one's coefficients); callers that gate all
    * three quantiles (p03, `estimateQuantilesAndDetect`) keep
    * [[estimateAndDetect]].
    *
    * @return (site, day, dil_slot, dil_value, q_fit)
    */
  def estimateSingle(
      spark: SparkSession,
      dilated: DataFrame,
      nBins: Int = 100,
      tau: Double = 0.9,
      harmonicsDaily: Int = 3,
      harmonicsYearly: Int = 2
  ): DataFrame = {
    import spark.implicits._
    val rows = dilated
      .select(
        col("site").cast("long"), col("day").cast("string"),
        col("dil_slot").cast("int"), col("dil_value").cast("double")
      )
      .as[(Long, String, Int, Double)]
    // same fixed-HashPartitioner solver-lane shape as
    // [[estimateAndDetect]] — see the notes there
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
          val fit = Kernels.quantileFourierFitMultiTaus(y, t, Seq(tau), bases).head
          pts.indices.iterator.map { i =>
            (siteId, pts(i)._2, pts(i)._3, y(i), fit(i))
          }
        }
      }
    spark.createDataset(solved)
      .toDF("site", "day", "dil_slot", "dil_value", "q_fit")
  }
}
