package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** VERDICT r13 item 9: the epoch-day narrow-type solver shuffle was
  * rejected in round 13 because, at memory-speed local shuffle, the
  * per-row `to_date` parse it adds cost more than the bytes it saves.
  * That measurement could not see real shuffle cost, so this probe
  * re-runs the A/B with ExternalSorter spills FORCED
  * (`spark.shuffle.spill.numElementsForceSpillThreshold`) so every
  * shuffle write pays serialization + disk like a memory-pressured
  * cluster shuffle. Ships only if the narrow lane wins here too.
  *
  * Usage: runMain graft.ProbeSpill [sfDir] [forceThreshold]
  */
object ProbeSpill {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val force = if (args.length > 1) args(1) else "20000"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-probe-spill")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force ExternalSorter to spill every `force` records: the RDD
      // solver shuffle then pays serialize+disk+merge per pass, the
      // regime where narrower rows should matter
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", force)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensure(spark)
    spark.experimental.extraOptimizations =
      Seq(graft.plans.RangeJoinRule, graft.plans.IntervalJoinRule)

    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id").as("site"), col("ts"), col("value"))
    val dil = graft.operators.Dilation.dilate(spark, ev, "site", "ts", "value", 40)

    /** Narrow lane: day shuffled as epoch-day Int (derived in SQL
      * before the exchange), string day rebuilt after the solve.
      */
    def narrowLane(nBins: Int, tau: Double): org.apache.spark.sql.DataFrame = {
      val harmonicsDaily = 3; val harmonicsYearly = 2
      val rows = dil
        .select(
          col("site").cast("long").as("site"),
          unix_date(col("day").cast("date")).as("epDay"),
          col("dil_slot").cast("int").as("dilSlot"),
          col("dil_value").cast("double").as("dilValue"))
        .as[(Long, Int, Int, Double)]
      val par = spark.sparkContext.defaultParallelism
      implicit val rowOrd: Ordering[(Long, Int, Int, Double)] =
        new Ordering[(Long, Int, Int, Double)] {
          override def compare(a: (Long, Int, Int, Double), b: (Long, Int, Int, Double)): Int = {
            val c1 = java.lang.Long.compare(a._1, b._1)
            if (c1 != 0) return c1
            val c2 = java.lang.Integer.compare(a._2, b._2)
            if (c2 != 0) return c2
            java.lang.Integer.compare(a._3, b._3)
          }
        }
      val solved = rows.rdd
        .map(r => (r, ()))
        .repartitionAndSortWithinPartitions(new org.apache.spark.Partitioner {
          override def numPartitions: Int = par
          override def getPartition(key: Any): Int = {
            val h = key.asInstanceOf[(Long, Int, Int, Double)]._1.hashCode
            ((h % par) + par) % par
          }
        })
        .mapPartitions { part =>
          val rowsIt = part.map(_._1).buffered
          new Iterator[Iterator[(Long, String, Int, Double, Double)]] {
            override def hasNext: Boolean = rowsIt.hasNext
            override def next(): Iterator[(Long, String, Int, Double, Double)] = {
              val siteId = rowsIt.head._1
              val days = scala.collection.mutable.ArrayBuffer.empty[String]
              val dayIdx = new scala.collection.mutable.ArrayBuilder.ofInt
              val slots = new scala.collection.mutable.ArrayBuilder.ofInt
              val t = new scala.collection.mutable.ArrayBuilder.ofDouble
              val y = new scala.collection.mutable.ArrayBuilder.ofDouble
              var curDay = Int.MinValue
              var day0 = 0
              var curOff = 0.0
              while (rowsIt.hasNext && rowsIt.head._1 == siteId) {
                val r = rowsIt.next()
                if (r._2 != curDay) {
                  curDay = r._2
                  if (days.isEmpty) day0 = r._2
                  curOff = (r._2 - day0).toDouble
                  days += java.time.LocalDate.ofEpochDay(r._2.toLong).toString
                }
                dayIdx += days.length - 1
                slots += r._3
                t += curOff * nBins.toDouble + r._3
                y += r._4
              }
              val dayArr = days.toArray; val di = dayIdx.result()
              val sl = slots.result(); val ta = t.result(); val ya = y.result()
              val bases = Seq((nBins.toDouble, harmonicsDaily), (365.2425 * nBins, harmonicsYearly))
              val fit = graft.solvers.Kernels.quantileFourierFitMultiTaus(ya, ta, Seq(tau), bases).head
              (0 until ya.length).iterator.map { j =>
                (siteId, dayArr(di(j)), sl(j), ya(j), fit(j))
              }
            }
          }.flatten
        }
      spark.createDataset(solved)
        .toDF("site", "day", "dil_slot", "dil_value", "q_fit")
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probespill] $label ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows, force=$force)")
    }
    // parity: identical kernel inputs in identical order -> q_fit must
    // be bit-identical between the two lanes
    val mism = graft.analyses.Quantiles.estimateSingle(spark, dil, 40, tau = 0.9)
      .join(narrowLane(40, 0.9).select(col("site"), col("day"), col("dil_slot"),
          col("dil_value").as("dv0"), col("q_fit").as("fit0")),
        Seq("site", "day", "dil_slot"), "full")
      .filter(col("dil_value") =!= col("dv0") || col("q_fit") =!= col("fit0") ||
        col("dil_value").isNull =!= col("dv0").isNull ||
        col("q_fit").isNull =!= col("fit0").isNull)
      .count()
    println(s"[probespill] narrow-lane mismatches: $mism (must be 0)")
    (1 to 3).foreach { rep =>
      System.gc()
      time(s"string-day lane rep$rep") {
        graft.analyses.Quantiles.estimateSingle(spark, dil, 40, tau = 0.9).count()
      }
      System.gc()
      time(s"epoch-day lane rep$rep")(narrowLane(40, 0.9).count())
    }
    spark.stop()
  }
}
