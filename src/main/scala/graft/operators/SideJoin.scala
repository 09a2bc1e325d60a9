package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-back strategy for side tables DERIVED FROM the scan — per-site
  * scalars (capacity, global max, first day) and (site, day) stats
  * (daily max, rise/set, time shifts). These grow with SITES or
  * SITE-DAYS, not with scan rows: ~5e7 site-days serialize to 1–2 GB,
  * comfortably inside Spark's 8 GB broadcast ceiling and ~10⁵× smaller
  * than the scan, so the default strategy FORCES a broadcast. (AQE's
  * 10 MB auto-threshold would otherwise fall back to sort-merge and
  * shuffle the entire scan — the catastrophic plan at 100 TB.)
  *
  * Deployments past the broadcast envelope (≫10⁸ site-days) set
  * `spark.graft.sideJoin=shuffle` on the session and every join-back
  * in the engine switches to a sort-merge join in one place. Because
  * the side table is derived FROM the scan, pre-bucketing the input by
  * `site` makes both sides of that sort-merge co-partitioned — the
  * shuffle-free layout `BucketingSpec` demonstrates.
  *
  * Genuinely-small static sides (centroids, LSH planes, dimension
  * tables, point-mass tables) do NOT route through here: they are
  * small by construction, not by data-model ratio, and stay
  * hard-broadcast at any scale.
  */
object SideJoin {

  /** Session conf key: `broadcast` (default) or `shuffle`. */
  val ConfKey = "spark.graft.sideJoin"

  val Broadcast = "broadcast"
  val Shuffle = "shuffle"

  /** Join `side` (derived, site/site-day grain) back onto `big` (the
    * scan grain) on `keys` under the session's configured strategy.
    */
  def back(big: DataFrame, side: DataFrame, keys: Seq[String], joinType: String = "inner"): DataFrame = {
    // right/full outer joins cannot build the broadcast (right) side:
    // Spark drops the hint with only a log warning and plans the
    // sort-merge that shuffles the scan — fail loudly instead
    val jt = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "fullouter", "outer").contains(jt),
      s"SideJoin.back: joinType '$joinType' cannot broadcast the side table " +
        "(Spark silently falls back to shuffling the scan); swap the sides " +
        "and use a left join instead")
    big.sparkSession.conf.get(ConfKey, Broadcast) match {
      case Broadcast => big.join(broadcast(side), keys, joinType)
      case Shuffle   => big.join(side.hint("shuffle_merge"), keys, joinType)
      case other =>
        throw new IllegalArgumentException(
          s"$ConfKey must be '$Broadcast' or '$Shuffle', got '$other'")
    }
  }
}
