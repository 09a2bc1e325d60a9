package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Write-path data layout: the other half of the 100 TB story.
  *
  * Every read-side win this engine leans on — directory partition
  * pruning, parquet row-group min/max skipping, co-partitioned joins —
  * exists only if the WRITER laid the data out for it. This object is
  * that writer, plus the audit tooling that proves the layout works:
  *
  *   - [[writeClustered]]: hive-partitioned directories (coarse,
  *     low-cardinality axes — pruned at planning time) + range-
  *     clustered, sorted files within each partition (fine, high-
  *     cardinality axes — pruned at scan time from row-group
  *     statistics). This is the parquet-native equivalent of
  *     Delta/Iceberg Z-ordering for the single-dimension case, with
  *     none of the table-format machinery.
  *   - [[filesScanned]]: what a query's scan actually touches after
  *     partition pruning — the number a layout change must move.
  *   - [[clusterRanges]]: per-file min/max of the cluster column from
  *     the parquet footers — disjoint ranges are the precondition for
  *     row-group skipping to approach binary search instead of a
  *     full scan.
  *
  * Scale notes. The dynamic-partition write is THE classic
  * small-files factory: a hash-distributed `partitionBy` makes every
  * task write every partition (tasks × partitions files, each tiny).
  * Range-distributing on (partition axes ++ cluster axes) first means
  * each task holds a contiguous slice of few partitions, so file
  * count ≈ max(tasks, partitions) and each file is dense and sorted.
  * `maxRecordsPerFile` bounds the other direction — a skewed
  * partition splits into several full files instead of one huge one
  * (row-group pruning still works: the split preserves sort order).
  */
object Layout {

  /** Write `df` hive-partitioned by `partitionCols` and range-
    * clustered/sorted by `clusterCols` within partitions.
    *
    * @param numRanges  range-shuffle width; 0 = the session's default
    *                   parallelism (at cluster scale: total input
    *                   bytes / target file bytes)
    * @param maxRecordsPerFile  hard row bound per file (skew guard)
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      clusterCols: Seq[String],
      numRanges: Int = 0,
      maxRecordsPerFile: Long = 4L * 1024 * 1024
  ): Unit = {
    require(clusterCols.nonEmpty || partitionCols.nonEmpty, "no layout axes given")
    val axes = (partitionCols ++ clusterCols).map(col)
    val n = if (numRanges > 0) numRanges else df.sparkSession.sparkContext.defaultParallelism
    val arranged = df
      .repartitionByRange(n, axes: _*)
      .sortWithinPartitions(axes: _*)
    arranged.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** Morton (Z-order) key over `cols` — multi-dimension clustering
    * for [[writeClustered]] when queries filter on MORE than one
    * high-cardinality axis (the Delta/Iceberg `OPTIMIZE ZORDER`
    * analog, parquet-native). Each column is min/max-scaled to a
    * `bits`-bit rank (one small stats aggregation, collected as plan
    * literals), then the ranks are bit-interleaved: sorting by the
    * interleaved key gives every file a bounded range in EVERY
    * z-dimension, so row-group min/max skipping works for predicates
    * on any of them — a single-column sort gives locality on that
    * column only, and files span the full domain of every other.
    *
    * Nulls rank lowest (coalesce to the column minimum); a constant
    * column ranks 0 everywhere and drops out of the interleave
    * harmlessly. `cols.size * bits` must fit a signed long.
    */
  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(cols.size * bits <= 62, s"${cols.size} cols x $bits bits exceeds a long")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("double")).as(s"mn$i"), max(col(c).cast("double")).as(s"mx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val maxRank = (1L << bits) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val mnIdx = stats.fieldIndex(s"mn$i")
      val mxIdx = stats.fieldIndex(s"mx$i")
      // null stats (empty frame, all-null column, non-numeric cast):
      // the column carries no ordering information — rank 0 drops it
      // from the interleave instead of NPEing here
      if (stats.isNullAt(mnIdx) || stats.isNullAt(mxIdx)) lit(0L)
      else {
        val mn = stats.getDouble(mnIdx)
        val mx = stats.getDouble(mxIdx)
        if (mx <= mn) lit(0L)
        else least(lit(maxRank), greatest(lit(0L),
          floor((coalesce(col(c).cast("double"), lit(mn)) - lit(mn)) /
            lit(mx - mn) * lit(maxRank.toDouble)).cast("long")))
      }
    }
    // interleave: output bit (b * nCols + i) = bit b of rank i
    val n = cols.size
    val terms = for (b <- 0 until bits; i <- 0 until n)
      yield shiftleft(shiftright(ranks(i), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** [[writeClustered]] with a Z-order cluster axis: range-distribute
    * and sort on the interleaved key, drop it before writing (it is
    * derivable, not data). Partition directories still come first —
    * z-ordering is for the fine-grained axes inside them.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      zCols: Seq[String],
      numRanges: Int = 0,
      maxRecordsPerFile: Long = 4L * 1024 * 1024,
      bits: Int = 16
  ): Unit = {
    val keyed = df.withColumn("__graft_z", zorderKey(df, zCols, bits))
    val axes = (partitionCols :+ "__graft_z").map(col)
    val n = if (numRanges > 0) numRanges else df.sparkSession.sparkContext.defaultParallelism
    keyed
      .repartitionByRange(n, axes: _*)
      .sortWithinPartitions(axes: _*)
      .drop("__graft_z")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** Number of files `df`'s scan reads AFTER partition pruning, from
    * the planned (not executed) physical scan — pruning happens at
    * planning time, so no job runs. The audit counterpart: compare
    * against the unfiltered table to see what a predicate saves.
    */
  def filesScanned(df: DataFrame): Long =
    scans(df.queryExecution.sparkPlan)
      .map(s => s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
        .map(_.files.size.toLong).sum)
      .sum

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case s: FileSourceScanExec if s.relation.fileFormat.isInstanceOf[ParquetFileFormat] => Seq(s)
    case other => other.children.flatMap(scans)
  }

  /** Per-file (min, max) of a long/int column, straight from the
    * parquet footers (driver-side, metadata-only — no data read).
    * Sorted by min. A clustered layout shows pairwise-disjoint
    * ranges; a hash layout shows every file spanning the full domain.
    */
  def clusterRanges(spark: SparkSession, path: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val blocks = reader.getFooter.getBlocks
          var i = 0
          var mn = Long.MaxValue
          var mx = Long.MinValue
          while (i < blocks.size()) {
            val cols = blocks.get(i).getColumns
            var j = 0
            while (j < cols.size()) {
              val c = cols.get(j)
              if (c.getPath.toDotString == column && c.getStatistics != null
                && !c.getStatistics.isEmpty) {
                c.getStatistics.genericGetMin match {
                  case l: java.lang.Long => mn = math.min(mn, l.longValue())
                  case n: java.lang.Integer => mn = math.min(mn, n.longValue())
                  case _ => ()
                }
                c.getStatistics.genericGetMax match {
                  case l: java.lang.Long => mx = math.max(mx, l.longValue())
                  case n: java.lang.Integer => mx = math.max(mx, n.longValue())
                  case _ => ()
                }
              }
              j += 1
            }
            i += 1
          }
          if (mn != Long.MaxValue) out += ((mn, mx))
        } finally reader.close()
      }
    }
    out.sortBy(_._1).toSeq
  }
}
