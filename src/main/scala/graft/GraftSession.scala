package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for correctness-parity with external SQL engines (UTC session
  * time zone) and for scale (AQE on, shuffle partitions sized for the
  * local harness; on a real cluster these are overridden per-deploy).
  */
object GraftSession {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalesces shuffle partitions by BYTES, but this engine's
      // per-site solver stages (mapGroups: IRLS fits, DP, DBSCAN) are
      // CPU-dense on byte-tiny groups — a few MB of day stats carry
      // seconds of solver work, and the 1 MiB default floor collapses
      // them onto one or two cores. A small floor keeps
      // parallelismFirst in charge (partitions ≈ cores) while still
      // letting genuinely large shuffles coalesce at scale.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
