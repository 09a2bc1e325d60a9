package graft.analyses

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.solvers.Cluster

/** Day-quality DBSCAN clustering as a relational operator (reference
  * `data_handler.py:1172-1199`: DBSCAN on per-day (density,
  * normalized daily max) score pairs — the pipeline's `cluster`
  * stage, `Pipeline.scala` quality clustering).
  *
  * DBSCAN's raw labels are visit-order-dependent in two ways that a
  * cross-engine gate must not depend on: cluster NUMBERING follows
  * discovery order, and a border point adjacent to two clusters keeps
  * whichever claimed it first. This operator therefore emits
  * CANONICAL labels, both order-free:
  *
  *  - a core point's cluster is named by the MINIMUM day among the
  *    cluster's core members (DBSCAN's core clusters are exactly the
  *    connected components of the core-point eps-graph, so the set —
  *    and hence its minimum — is visit-order invariant);
  *  - a border point is assigned to the minimum such name among its
  *    adjacent core points (the deterministic tie rule; classic
  *    DBSCAN leaves this tie unspecified);
  *  - noise (no core neighbor, not core) gets a null cluster.
  *
  * The per-site state is day-grain (bounded: one point per day), so
  * the O(days²) scan inside `mapGroups` is the same envelope as every
  * other per-site solver stage; the raw scan is touched exactly once,
  * by the day aggregation.
  */
object QualityClusters {

  /** @return (site, day DATE, is_core, cluster_day DATE|null) — one
    *   row per observed (site, day); `cluster_day` is the canonical
    *   cluster name (min core day), null for noise.
    */
  def dbscanDayClusters(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      eps: Double = 0.06,
      minPts: Int = 3
  ): DataFrame = {
    import spark.implicits._
    // the day frame feeds the site-grain scale aggregate AND the main
    // point projection; without sharing, each consumer re-executes the
    // whole dayStats subtree (2 parquet scans apiece — PlanSpec pins
    // the total at ≤ 2). A site-keyed repartition does NOT dedupe here
    // (column pruning diverges the two branches' projections, so the
    // Exchanges never canonicalize equal — measured 8 scans), and a
    // bare .persist() leaked a cached RDD per call for the session's
    // lifetime (the facade invites repeated calls). So: persist, run
    // the whole derivation, eagerly localCheckpoint the OUTPUT (both
    // tables are day-grain tiny), and release the input in the
    // finally — the pcaShade idiom (Shade.scala).
    val day0 = Pipeline.dayStats(
        df.filter(!isnan(col(valueCol))), site, tsCol, valueCol)
      .select(col("site"), col("day"), col("density"), col("daily_max"))
    val dayRdd = day0.rdd.setName("dbscan day features").persist()
    val day = spark.createDataFrame(dayRdd, day0.schema)
    try {
      dbscanOn(spark, day, eps, minPts).localCheckpoint(true)
    } finally {
      dayRdd.unpersist(blocking = false)
    }
  }

  private def dbscanOn(
      spark: SparkSession,
      day: org.apache.spark.sql.DataFrame,
      eps: Double,
      minPts: Int
  ): DataFrame = {
    import spark.implicits._
    // the pipeline's mScale guard: max over finite daily maxes, 1e-9 floor
    val scale = day.groupBy(col("site"))
      .agg(greatest(max(col("daily_max")), lit(1e-9)).as("m_scale"))
    val pts = day.join(broadcast(scale), Seq("site"))
      .select(
        col("site").cast("string").as("site"),
        col("day").cast("string").as("day"),
        col("density").as("x"),
        (col("daily_max") / col("m_scale")).as("y"))
      .as[(String, String, Double, Double)]
    val eps2 = eps * eps
    pts.groupByKey(_._1)
      .flatMapGroups { (siteId: String, it: Iterator[(String, String, Double, Double)]) =>
        val p = it.toArray.sortBy(_._2) // chronological, like the pipeline's day-ordered arrays
        val n = p.length
        val labels = Cluster.dbscan2d(p.map(_._3), p.map(_._4), eps, minPts)
        // recompute the eps-geometry once for core flags + border rule
        val adj = Array.tabulate(n) { i =>
          (0 until n).filter { j =>
            val dx = p(i)._3 - p(j)._3
            val dy = p(i)._4 - p(j)._4
            dx * dx + dy * dy <= eps2
          }
        }
        val isCore = Array.tabulate(n)(i => adj(i).length >= minPts)
        // canonical name per OPERATOR cluster = min day over its core
        // members — this is where the gate actually checks dbscan2d's
        // cluster structure against the oracle's component closure
        val canonOf = labels.indices
          .filter(i => isCore(i) && labels(i) >= 0)
          .groupBy(labels(_))
          .map { case (lbl, is) => lbl -> is.map(p(_)._2).min }
        Iterator.tabulate(n) { i =>
          val cluster: Option[String] =
            if (isCore(i)) canonOf.get(labels(i))
            else {
              val coreNb = adj(i).filter(j => j != i && isCore(j))
              if (coreNb.isEmpty) None
              else Some(coreNb.map(j => canonOf(labels(j))).min)
            }
          (siteId, p(i)._2, isCore(i), cluster.orNull)
        }
      }
      .toDF("site", "day", "is_core", "cluster_day")
  }
}
