package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Layout, Tables}

/** Write-path layout contracts: the clustered writer must produce a
  * layout that (a) planning-time partition pruning actually skips,
  * (b) carries disjoint per-file min/max ranges on the cluster axis
  * (the precondition for row-group skipping), and (c) avoids the
  * dynamic-partition small-files explosion. These are checked against
  * the real artifacts — scan plans and parquet footers — not against
  * the writer's intent.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def tmp(): String = Files.createTempDirectory("layoutspec").toString

  test("partition pruning: a type predicate reads only its directory") {
    val out = tmp()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writeClustered(ev, out, Seq("event_type"), Seq("user_id"), numRanges = 4)

    val back = spark.read.parquet(out)
    val total = Layout.filesScanned(back)
    val types = back.select("event_type").distinct().count()
    assert(types > 1, "need >1 partition for a pruning test")
    val one = Layout.filesScanned(back.filter(col("event_type") === "click"))
    assert(one < total, s"pruned scan reads $one of $total files")
    // value parity: layout must never change results
    assert(back.count() == ev.count())
    val a = ev.agg(sum("value")).collect()(0).getDouble(0)
    val b = back.agg(sum("value")).collect()(0).getDouble(0)
    assert(math.abs(a - b) < 1e-6 * math.abs(a))
  }

  test("cluster ranges are pairwise disjoint; hash layout is not") {
    val outC = tmp()
    val outH = tmp()
    val ev = Tables.events(spark, "/root/testdata/sf0.001").select("event_id", "user_id", "value")
    Layout.writeClustered(ev, outC, Seq.empty, Seq("user_id"), numRanges = 8)
    ev.repartition(8, col("event_id")).write.mode("overwrite").parquet(outH) // hash strawman

    val clustered = Layout.clusterRanges(spark, outC, "user_id")
    assert(clustered.size > 1, s"expected several files, got ${clustered.size}")
    clustered.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(bMin >= aMax, s"overlapping cluster ranges: max=$aMax vs next min=$bMin")
      case _ => ()
    }
    val hashed = Layout.clusterRanges(spark, outH, "user_id")
    val domain = hashed.map(_._2).max - hashed.map(_._1).min
    // every hash file spans ~the whole user_id domain — the layout
    // row-group pruning cannot use
    assert(hashed.forall { case (mn, mx) => mx - mn > domain / 2 })
  }

  test("dynamic-partition write stays dense: files ≈ partitions, not tasks × partitions") {
    val out = tmp()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writeClustered(ev, out, Seq("event_type"), Seq("user_id"), numRanges = 8)
    val nFiles = Layout.clusterRanges(spark, out, "user_id").size
    val nParts = spark.read.parquet(out).select("event_type").distinct().count()
    // range distribution on (event_type, user_id) keeps each task on
    // few partitions: allow ranges + partitions, not ranges × partitions
    assert(nFiles <= nParts + 8, s"$nFiles files for $nParts partitions — small-files explosion")
  }

  test("z-order bounds per-file ranges in EVERY z-dimension; single-col sort does not") {
    import spark.implicits._
    // two independent uniform dims — the worst case for a single-column sort
    val n = 40000
    val df = (0 until n).map { i => (i.toLong, ((i.toLong * 2654435761L) % n), i.toDouble) }
      .toDF("a", "b", "v")
    val outZ = tmp()
    val outA = tmp()
    Layout.writeZOrdered(df, outZ, Seq.empty, Seq("a", "b"), numRanges = 16,
      maxRecordsPerFile = 4000)
    Layout.writeClustered(df, outA, Seq.empty, Seq("a"), numRanges = 16,
      maxRecordsPerFile = 4000)

    def medianWidth(path: String, c: String): Double = {
      val w = Layout.clusterRanges(spark, path, c).map { case (mn, mx) => (mx - mn).toDouble }
        .sorted
      w(w.size / 2)
    }
    val domain = n.toDouble
    // z layout: BOTH dims bounded well below the domain per file
    assert(medianWidth(outZ, "a") < domain / 2, s"z: a width ${medianWidth(outZ, "a")}")
    assert(medianWidth(outZ, "b") < domain / 2, s"z: b width ${medianWidth(outZ, "b")}")
    // a-sorted layout: a is tight but b spans ~the whole domain per file
    assert(medianWidth(outA, "a") < domain / 8)
    assert(medianWidth(outA, "b") > domain / 2, s"a-sort: b width ${medianWidth(outA, "b")}")
    // layout never changes content
    assert(spark.read.parquet(outZ).agg(sum("v")).collect()(0).getDouble(0)
      == df.agg(sum("v")).collect()(0).getDouble(0))
  }

  test("maxRecordsPerFile splits a skewed partition without breaking sort order") {
    val out = tmp()
    val ev = Tables.events(spark, "/root/testdata/sf0.001").select("event_id", "user_id", "value")
    Layout.writeClustered(ev, out, Seq.empty, Seq("user_id"), numRanges = 2,
      maxRecordsPerFile = 100)
    val ranges = Layout.clusterRanges(spark, out, "user_id")
    assert(ranges.size > 2, "row bound should force extra files")
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(bMin >= aMax)
      case _ => ()
    }
  }
}
