package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Mixing, TextOps}
import graft.sources.Tables

/** End-to-end demo of the training-data lifecycle on the documents
  * table: dedup (exact groups + LSH near-dup clusters) → quality and
  * repetition filtering → benchmark contamination audit → stratified
  * sampling → temperature weights → weighted interleave → greedy
  * packing into context windows. Shows library ergonomics and
  * doubles as a runnable smoke for the corpus stack.
  *
  * Usage: runMain graft.examples.CorpusDemo [sfDir]
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val docs = Tables.documents(spark, sfDir).cache()
    println(s"[demo] corpus: ${docs.count()} documents")

    // 1. exact dedup: keep one representative per distinct content
    val fp = docs.withColumn("fp", TextOps.fingerprint(col("text")))
    val kept = fp
      .withColumn("rep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("rep"))
      .drop("fp", "rep")
      .cache()
    println(s"[demo] after exact dedup: ${kept.count()}")

    // 2. near-dup clusters: LSH candidates verified by exact Jaccard
    // (band collisions alone over-connect a small-vocabulary corpus)
    val sh = Dedup.charShingles(kept, "doc_id", "text", 3)
    val cands = Dedup.lshCandidates(Dedup.lshBandsFromShingles(sh, "doc_id", 32, 4), "doc_id")
    val edges = Dedup.jaccardOnCandidates(cands, sh, "doc_id")
      .filter(col("jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"))
    val comps = Dedup.connectedComponents(kept.select(col("doc_id")), edges, "doc_id", partitions = 4)
    val nearKept = kept.join(
      comps.withColumn("rep", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("component"))))
        .filter(col("id") === col("rep")).select(col("id").as("doc_id")),
      Seq("doc_id"))
    println(s"[demo] after near-dup clustering: ${nearKept.count()}")

    // 2b. span-level audit: how much VERBATIM text the survivors
    // still share (whole-document sketches can't see shared passages)
    val spans = graft.operators.Dedup.dupSpans(nearKept, "doc_id", "text", 15)
    println("[demo] worst duplicated-span coverage among kept docs:")
    spans.orderBy(col("dup_frac").desc).show(3)

    // 3. quality + repetition filter: heuristic score, in-row bigram
    // repetition, compression ratio, and the corpus-trained unigram
    // LM score (each catches junk the others miss)
    val lm = graft.operators.LangModel.unigramScore(nearKept, "doc_id", "text", 1000)
    val scored = nearKept
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .withColumn("dup_frac", TextOps.dupNgramFrac(col("text"), 2))
      .withColumn("deflate", call_function("graft_deflate_ratio", col("text")))
      .join(lm.select(col("doc_id"), col("avg_logp")), Seq("doc_id"), "left")
    val clean = scored
      .filter(col("quality") >= 0.3 && col("dup_frac") <= 0.3 && col("deflate") >= 0.2)
      .cache()
    println(s"[demo] after quality/repetition/compression filter: ${clean.count()}")
    println("[demo] least-typical docs by unigram LM score:")
    clean.orderBy(col("avg_logp").asc_nulls_last).select("doc_id", "avg_logp", "quality").show(3)

    // 4. contamination audit against a held-out "benchmark" slice
    val contam = Dedup.contamination(
      clean.filter(col("doc_id") >= 20), clean.filter(col("doc_id") < 20),
      "doc_id", "text", 5)
    println("[demo] most-contaminated benchmark docs:")
    contam.orderBy(col("contamination").desc).show(5)

    // 4b. budget selection: the best of what survived, under a token
    // budget (bucket histogram + broadcast cumulative — no global sort)
    val selected = Mixing.budgetSelect(clean, "doc_id",
      TextOps.tokenCount(col("text")), TextOps.qualityScore(col("text")), 12000L)
    val selStats = selected.filter(col("kept"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("tokens")), lit(0L)).as("tok")).head
    println(s"[demo] budget-selected: ${selStats.getLong(0)} docs " +
      s"(${selStats.getLong(1)} tokens of 12000 budget)")

    // 5. stratified sampling + temperature weights + interleave + pack
    val sampled = Mixing.stratifiedSample(clean, Seq("lang"), "doc_id", 100L)
      .filter(col("kept"))
      .drop("n_stratum", "keep_threshold", "kept")
    val weights = Mixing.temperatureWeights(sampled, Seq("source"), 10000.0)
    println("[demo] temperature mixture weights (smallest strata up-weighted):")
    weights.orderBy(col("n_stratum")).show(5)

    // the interleave key defines the TRAINING ORDER (a range-
    // partitioned sort realizes it); packing shards by hash are an
    // independent, order-free grouping of the same stream
    val ordered = sampled
      .join(broadcast(weights.select(col("source"), col("n_stratum"), col("weight"))), Seq("source"))
      .withColumn("ikey", Mixing.interleaveKey(col("doc_id"), col("n_stratum"), col("weight")))
    println("[demo] head of the weighted-interleave training order:")
    ordered.orderBy(col("ikey")).select("doc_id", "source", "lang", "ikey").show(5)

    val packs = Mixing.packGreedy(
      sampled, "doc_id", TextOps.approxBpeTokens(col("text")), budget = 512L, nShards = 8)
    val packStats = packs.groupBy(col("shard"), col("pack_id"))
      .agg(sum(col("tok")).as("tok"), count(lit(1)).as("n_docs"))
    println("[demo] pack fill (512-token windows):")
    packStats.agg(
      count(lit(1)).as("n_packs"),
      round(avg(col("tok")), 1).as("avg_tok"),
      round(avg(col("n_docs")), 2).as("avg_docs")).show()

    spark.stop()
  }
}
