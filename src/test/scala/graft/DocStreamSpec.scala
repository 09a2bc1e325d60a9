package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables
import graft.streaming.DocStream

/** Streaming dedup twins: scalar band signatures are byte-identical
  * to the batch LSH path, and the incremental exact-dedup /
  * candidate-pair streams reproduce the batch decisions across
  * checkpointed micro-batches.
  */
class DocStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select("doc_id", "text", "lang", "source", "n_chars")

  test("scalar band signatures are byte-identical to the batch shingle-aggregation path") {
    val d = docs.limit(120).cache()
    val scalar = d
      .select(col("doc_id"), explode(DocStream.bandSigs(col("text"), 3, 32, 4)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.band_sig").as("band_sig"))
    val batch = Dedup.lshBandsFromShingles(
      Dedup.charShingles(d, "doc_id", "text", 3), "doc_id", 32, 4)
    assert(scalar.except(batch).count() == 0 && batch.except(scalar).count() == 0,
      "scalar and batch band signatures diverge")
  }

  test("incremental exact dedup matches batch groups and survives a checkpoint restart") {
    val src = java.nio.file.Files.createTempDirectory("docsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("docckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("docout").toString

    // chunk 1 = low ids, chunk 2 = high ids: first-seen == min id, so
    // the streaming representative equals the batch min-id rep
    docs.filter(col("doc_id") < 250).write.mode("append").parquet(src)
    val out1 = DocStream.incrementalExactDedup(spark, src, ckpt, outDir)
    assert(out1.count() == docs.filter(col("doc_id") < 250).count(),
      "every arriving doc must get exactly one verdict")

    // chunk 2 carries a verbatim copy of doc 0 under a new high id —
    // the cross-micro-batch duplicate the state must catch
    val copyOfZero = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(999999L))
    val all = docs.unionByName(copyOfZero)
    docs.filter(col("doc_id") >= 250).unionByName(copyOfZero)
      .write.mode("append").parquet(src)
    val out2 = DocStream.incrementalExactDedup(spark, src, ckpt, outDir)
    assert(out2.count() == all.count(), "second batch re-emitted or dropped verdicts")

    val batch = all
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .withColumn("rep_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .withColumn("is_dup", col("doc_id") =!= col("rep_id"))
    assert(out2.select("doc_id", "fp", "is_dup", "rep_id")
      .except(batch.select("doc_id", "fp", "is_dup", "rep_id")).count() == 0,
      "streaming verdicts diverge from the batch dedup groups")
    // the injected cross-chunk duplicate was caught against chunk-1 state
    val v = out2.filter(col("doc_id") === 999999L).collect()
    assert(v.length == 1 && v.head.getAs[Boolean]("is_dup") && v.head.getAs[Long]("rep_id") == 0L)
  }

  test("incremental LSH candidates equal the batch candidate set across micro-batches") {
    val src = java.nio.file.Files.createTempDirectory("lshsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lshckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("lshout").toString
    val d = docs.filter(col("doc_id") < 150).cache()

    d.filter(col("doc_id") < 75).write.mode("append").parquet(src)
    DocStream.incrementalLshCandidates(spark, src, ckpt, outDir, maxBucket = 1000)
    d.filter(col("doc_id") >= 75).write.mode("append").parquet(src)
    val got = DocStream.incrementalLshCandidates(spark, src, ckpt, outDir, maxBucket = 1000)
      .select("a_id", "b_id").distinct()

    val expect = Dedup.lshCandidates(
      Dedup.lshBandsFromShingles(Dedup.charShingles(d, "doc_id", "text", 3), "doc_id", 32, 4),
      "doc_id")
    assert(got.except(expect).count() == 0, "streaming emitted pairs the batch path lacks")
    assert(expect.except(got).count() == 0, "streaming missed batch candidate pairs")
    assert(got.count() > 0)
  }

  test("state TTL evicts cold fingerprints: a late duplicate is re-admitted as kept") {
    val src = java.nio.file.Files.createTempDirectory("ttlsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ttlckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("ttlout").toString
    val ttl = 500L

    docs.filter(col("doc_id") === 0).write.mode("append").parquet(src)
    DocStream.incrementalExactDedup(spark, src, ckpt, outDir, ttlMs = ttl)
    Thread.sleep(2 * ttl + 500)

    // a tick with unrelated data: doc 0's fingerprint group has no new
    // rows and is past its TTL, so this batch evicts it
    docs.filter(col("doc_id") === 1).write.mode("append").parquet(src)
    DocStream.incrementalExactDedup(spark, src, ckpt, outDir, ttlMs = ttl)

    // the late duplicate of the now-cold content: re-admitted as KEPT
    // (the documented TTL tradeoff), rep = itself
    docs.filter(col("doc_id") === 0).withColumn("doc_id", lit(777L))
      .write.mode("append").parquet(src)
    val out = DocStream.incrementalExactDedup(spark, src, ckpt, outDir, ttlMs = ttl)
    val v = out.filter(col("doc_id") === 777L).collect()
    assert(v.length == 1)
    assert(!v.head.getAs[Boolean]("is_dup") && v.head.getAs[Long]("rep_id") == 777L,
      "cold content was not re-admitted as kept after TTL eviction")
  }

  test("state TTL evicts cold LSH buckets: a late near-dup of cold members goes unpaired") {
    val src = java.nio.file.Files.createTempDirectory("lttlsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lttlckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("lttlout").toString
    val ttl = 500L

    docs.filter(col("doc_id") === 0).write.mode("append").parquet(src)
    DocStream.incrementalLshCandidates(spark, src, ckpt, outDir, ttlMs = ttl)
    Thread.sleep(2 * ttl + 500)

    // a tick with unrelated content evicts doc 0's cold buckets
    docs.filter(col("doc_id") === 1).write.mode("append").parquet(src)
    DocStream.incrementalLshCandidates(spark, src, ckpt, outDir, ttlMs = ttl)

    // a verbatim copy of doc 0 arrives after eviction: with warm state
    // it would share every band bucket and emit pairs; cold → none
    docs.filter(col("doc_id") === 0).withColumn("doc_id", lit(555L))
      .write.mode("append").parquet(src)
    val out = DocStream.incrementalLshCandidates(spark, src, ckpt, outDir, ttlMs = ttl)
    assert(out.filter(col("a_id") === 0L && col("b_id") === 555L).count() == 0,
      "evicted bucket still paired the late duplicate against a cold member")
  }

  test("incremental mixture weights snapshot equals the batch weights after each tick") {
    val src = java.nio.file.Files.createTempDirectory("mixsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mixckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("mixout").toString

    docs.filter(col("doc_id") < 25).write.mode("append").parquet(src)
    val snap1 = DocStream.incrementalMixtureWeights(spark, src, ckpt, outDir)
    val batch1 = graft.operators.Mixing.temperatureWeights(
      docs.filter(col("doc_id") < 25), Seq("source"), 10000.0)
    assert(snap1.except(batch1).count() == 0 && batch1.except(snap1).count() == 0,
      "tick-1 snapshot diverges from batch weights")

    docs.filter(col("doc_id") >= 25).write.mode("append").parquet(src)
    val snap2 = DocStream.incrementalMixtureWeights(spark, src, ckpt, outDir)
    val batch2 = graft.operators.Mixing.temperatureWeights(docs, Seq("source"), 10000.0)
    assert(snap2.except(batch2).count() == 0 && batch2.except(snap2).count() == 0,
      "tick-2 snapshot diverges from batch weights over the full corpus")
  }

  test("incremental vocabulary snapshot equals the batch stats after each tick") {
    val src = java.nio.file.Files.createTempDirectory("vocsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vocckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("vocout").toString

    docs.filter(col("doc_id") < 25).write.mode("append").parquet(src)
    val snap1 = DocStream.incrementalVocab(spark, src, ckpt, outDir)
    val batch1 = graft.operators.LangModel.vocabStats(docs.filter(col("doc_id") < 25), "text", 20)
    assert(snap1.except(batch1).count() == 0 && batch1.except(snap1).count() == 0,
      "tick-1 snapshot diverges from batch vocab stats")

    docs.filter(col("doc_id") >= 25).write.mode("append").parquet(src)
    val snap2 = DocStream.incrementalVocab(spark, src, ckpt, outDir)
    val batch2 = graft.operators.LangModel.vocabStats(docs, "text", 20)
    assert(snap2.except(batch2).count() == 0 && batch2.except(snap2).count() == 0,
      "tick-2 snapshot diverges from batch vocab stats over the full corpus")
  }

  test("incremental CMS snapshot equals the batch counter table after each tick") {
    val src = java.nio.file.Files.createTempDirectory("cmssrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cmsckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("cmsout").toString
    def batchCms(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TextOps.cmsCounters(
        d.select(explode(split(trim(col("text")), "\\s+")).as("w"))
          .filter(length(col("w")) > 0), "w", 4, 16)

    docs.filter(col("doc_id") < 25).write.mode("append").parquet(src)
    val snap1 = DocStream.incrementalCms(spark, src, ckpt, outDir)
    val b1 = batchCms(docs.filter(col("doc_id") < 25))
    assert(snap1.except(b1).count() == 0 && b1.except(snap1).count() == 0,
      "tick-1 CMS snapshot diverges from the batch counters")

    docs.filter(col("doc_id") >= 25).write.mode("append").parquet(src)
    val snap2 = DocStream.incrementalCms(spark, src, ckpt, outDir)
    val b2 = batchCms(docs)
    assert(snap2.except(b2).count() == 0 && b2.except(snap2).count() == 0,
      "tick-2 CMS snapshot diverges from the batch counters over the full corpus")
    // bounded state: the snapshot is the sketch itself — at most d*w rows
    assert(snap2.count() <= 4 * 16)
  }

  test("incremental packing holds every batch invariant across a checkpointed restart") {
    val src = java.nio.file.Files.createTempDirectory("packsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("packckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("packout").toString
    val budget = 512L

    docs.filter(col("doc_id") < 25).write.mode("append").parquet(src)
    DocStream.incrementalPack(spark, src, ckpt, outDir, budget, nShards = 4)
    docs.filter(col("doc_id") >= 25).write.mode("append").parquet(src)
    val out = DocStream.incrementalPack(spark, src, ckpt, outDir, budget, nShards = 4).cache()

    // every doc assigned exactly once, with a final verdict at arrival
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // no multi-doc pack over budget — including packs SPANNING the two
    // micro-batches (open-pack state carried across the restart)
    val packs = out.groupBy(col("shard"), col("pack_id"))
      .agg(sum(col("tok")).as("tok_sum"), count(lit(1)).as("n_docs"))
    assert(packs.filter(col("tok_sum") > budget && col("n_docs") > 1).count() == 0,
      "multi-doc pack exceeds the budget")
    // dense pack ids per shard
    val dense = packs.groupBy(col("shard"))
      .agg(max(col("pack_id")).as("mx"), countDistinct(col("pack_id")).as("nd"))
    assert(dense.filter(col("mx") =!= col("nd")).count() == 0, "pack ids not dense")
  }

  test("incremental winnowing pair log aggregates to the batch winnowPairs counts") {
    val src = java.nio.file.Files.createTempDirectory("winsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("winckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("winout").toString
    val d = docs.filter(col("doc_id") < 150).cache()

    // cap high enough that no hash exceeds it: past the cap the
    // streaming (prefix) and batch (retrospective) semantics differ
    d.filter(col("doc_id") < 75).write.mode("append").parquet(src)
    DocStream.incrementalWinnowPairs(spark, src, ckpt, outDir, maxDocsPerHash = 1000)
    d.filter(col("doc_id") >= 75).write.mode("append").parquet(src)
    val got = DocStream.incrementalWinnowPairs(spark, src, ckpt, outDir, maxDocsPerHash = 1000)
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))

    val expect = Dedup.winnowPairs(
      Dedup.winnowFingerprints(d, "doc_id", "text", 5, 4), "doc_id", maxDocsPerHash = 1000)
      .select("a_id", "b_id", "n_shared")
    assert(got.except(expect).count() == 0, "streaming pair counts absent from batch")
    assert(expect.except(got).count() == 0, "batch pair counts missing from the stream log")
    assert(got.count() > 0)
  }

  test("incremental source cap: quota exact across micro-batches, verdicts final") {
    val src = java.nio.file.Files.createTempDirectory("capsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("capckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("capout").toString
    val d = docs.filter(col("doc_id") < 200).cache()

    d.filter(col("doc_id") < 100).write.mode("append").parquet(src)
    val out1 = DocStream.incrementalSourceCap(spark, src, ckpt, outDir, cap = 3L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("capped_keep").cast("long")).as("n_kept"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    d.filter(col("doc_id") >= 100).write.mode("append").parquet(src)
    val out2df = DocStream.incrementalSourceCap(spark, src, ckpt, outDir, cap = 3L)
    val out2 = out2df
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("capped_keep").cast("long")).as("n_kept"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val perSource = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (s, n) =>
      assert(out2(s)._1 == n, s"source $s: ${out2(s)._1} verdicts for $n docs")
      assert(out2(s)._2 == math.min(3L, n), s"source $s kept ${out2(s)._2}, cap 3")
    }
    // batch-1 verdicts are final: already-kept counts never shrink
    out1.foreach { case (s, (_, kept1)) =>
      assert(out2(s)._2 >= kept1, s"source $s lost kept verdicts after batch 2")
    }
    // arrival ranks are a dense 1..n per source
    val ranks = out2df.groupBy(col("source"))
      .agg(max(col("arrival_rank")).as("mx"), countDistinct(col("arrival_rank")).as("nd"),
        count(lit(1)).as("n"))
    assert(ranks.filter(col("mx") =!= col("n") || col("nd") =!= col("n")).count() == 0,
      "arrival ranks not dense per source")
  }

  test("incremental boilerplate ledger equals the batch frequency set across a restart") {
    val src = java.nio.file.Files.createTempDirectory("blsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("blckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("blout").toString
    // manufactured multi-line docs (the d44 construction)
    val lined = docs
      .select(col("doc_id"),
        concat(lit("header "), col("source"), lit("\n"),
          substring(col("text"), 1, 80), lit("\n"),
          lit("footer "), col("lang")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .cache()
    lined.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(src)
    DocStream.incrementalLineBoilerplate(spark, src, ckpt, outDir, minDocs = 5)
    lined.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(src)
    val out = DocStream.incrementalLineBoilerplate(spark, src, ckpt, outDir, minDocs = 5)

    // batch frequency set over the full corpus
    val batch = lined
      .select(explode(array_distinct(transform(
        split(col("text"), java.util.regex.Pattern.quote("\n")), l => md5(l)))).as("h"))
      .groupBy(col("h")).count()
      .filter(col("count") >= 5)
    assert(batch.count() > 0, "the construction must produce boilerplate")
    val streamSet = out.select("h").distinct()
    assert(streamSet.count() == out.count(), "a digest crossed the threshold twice")
    assert(streamSet.except(batch.select("h")).count() == 0 &&
      batch.select("h").except(streamSet).count() == 0,
      "ledger diverged from the batch frequency set")
    // and the batch operator cleans to the same result as cleaning
    // against the ledger set (membership equality implies it; spot-check
    // one doc anyway)
    val cleaned = Dedup.lineBoilerplate(
      lined.select("doc_id", "text"), "doc_id", "text", minDocs = 5)
    assert(cleaned.filter(col("n_removed") < 2).count() == 0,
      "every doc carries at least header+footer boilerplate")
  }
}
