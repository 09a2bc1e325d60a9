package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Corpus-trained unigram language-model scoring — the KenLM-shaped
  * quality filter of LLM data pipelines (CCNet et al. score documents
  * by LM perplexity and drop the tail; a unigram model over the
  * corpus's own vocabulary is the distributable first rung of that
  * ladder, and the plan shape below is exactly what a bigger model
  * needs too).
  *
  * Model: the top-`vocabK` words by corpus frequency (ties broken by
  * word — deterministic on any engine) with add-one smoothing over a
  * single shared out-of-vocabulary bucket:
  * `p(w in model) = (cnt_w + 1) / (total + vocabK + 1)`,
  * `p(OOV) = 1 / (total + vocabK + 1)` — `total` counted over ALL
  * token occurrences, so every probability is an exact integer ratio.
  *
  * Scale shape for 100 TB: the vocabulary CAP is what makes the plan
  * scale-safe — the model is `vocabK` rows by construction (a
  * distributed TakeOrdered over the word counts, the d16 pattern;
  * never a global sort), so the score join is a BROADCAST probe and
  * the corpus token stream never shuffles for the model. The only
  * corpus-sized shuffles are the word-count aggregation (map-side
  * combined, keyed by word) and the per-document score aggregation
  * (keyed by doc id) — both linear, both skew-free.
  */
object LangModel {

  /** The corpus word-count table, persisted as an RDD: it feeds up to
    * three downstream subtrees (total, top-K model, bigram
    * denominators) and Spark does not dedupe common subplans — without
    * this the corpus would be re-scanned and re-shuffled once per use.
    * RDD persist (not DataFrame cache) so the ContextCleaner releases
    * it when the scorer's result goes out of scope (the
    * `Shade.pcaShade` lesson). The cached volume is vocabulary-sized,
    * never corpus-sized.
    */
  private def persistedCounts(toks: DataFrame, cntName: String): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val rdd = toks.groupBy(col("w")).agg(count(lit(1)).as(cntName))
      .as[(String, Long)].rdd.setName("LangModel word counts").persist()
    spark.createDataset(rdd).toDF("w", cntName)
  }

  /** Per-document unigram LM score against the corpus's own top-K
    * vocabulary.
    *
    * @return (idCol, n_tokens, n_oov, avg_logp) — `avg_logp` is the
    *         mean natural-log token probability (≤ 0; higher = more
    *         typical of the corpus), rounded to 6 places; empty/
    *         whitespace-only docs score n_tokens=0 with null avg_logp.
    */
  def unigramScore(docs: DataFrame, idCol: String, textCol: String, vocabK: Int): DataFrame = {
    require(vocabK >= 1, s"unigramScore: vocabK must be >= 1, got $vocabK")
    val words = docs
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = persistedCounts(words, "cnt")
    val total = counts.agg(sum(col("cnt")).cast("long").as("total"))
    val model = counts.orderBy(col("cnt").desc, col("w").asc).limit(vocabK)
    val scored = words
      .join(broadcast(model), Seq("w"), "left")
      .crossJoin(broadcast(total))
      .select(
        col(idCol),
        col("cnt").isNull.cast("long").as("oov"),
        log(coalesce(col("cnt") + lit(1L), lit(1L)).cast("double") /
          (col("total") + lit(vocabK.toLong + 1L)).cast("double")).as("logp"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("oov")).as("n_oov"),
        round(avg(col("logp")), 6).as("avg_logp"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("avg_logp"))
  }

  /** Per-document bigram LM score with stupid backoff (Brants et al.
    * 2007): each bigram occurrence `(w1, w2)` scores
    * `ln(cnt(w1 w2) / cnt(w1))` when the bigram is in the top-`bigramK`
    * model, else backs off to `ln(0.4 · p_unigram(w2))` with the
    * [[unigramScore]] add-one unigram model (top-`vocabK`, shared OOV
    * bucket). Bigrams are built IN-ROW from the token array (no
    * position window, no per-doc sort); both model tables are capped
    * by construction, so they broadcast and the corpus token stream
    * never shuffles for the model — the same 100 TB plan shape as the
    * unigram scorer, one rung up the KenLM ladder.
    *
    * @return (idCol, n_bigrams, n_hits, avg_logp) — docs with < 2
    *         tokens score n_bigrams=0 with null avg_logp.
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  vocabK: Int, bigramK: Int, backoff: Double = 0.4): DataFrame = {
    require(vocabK >= 1 && bigramK >= 1,
      s"bigramScore: vocabK and bigramK must be >= 1, got ($vocabK, $bigramK)")
    val toks = docs
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = persistedCounts(toks, "cntu")
    val total = counts.agg(sum(col("cntu")).cast("long").as("total"))
    // the exploded bigram stream below appears in two subtrees (model
    // counts, scoring) and is deliberately NOT cached: its volume is
    // corpus-sized, and at scale re-reading the columnar scan is
    // cheaper than spill-caching every token occurrence
    val uniModel = counts.orderBy(col("cntu").desc, col("w").asc).limit(vocabK)
      .withColumnRenamed("w", "w2")
    // bigram occurrences, formed in-row; tokens of a trimmed \s+ split
    // contain no whitespace, so "w1 w2" is an unambiguous key
    val ws = split(trim(col(textCol)), "\\s+")
    val bigrams = docs.select(
      col(idCol),
      explode(transform(
        when(size(ws) >= 2, sequence(lit(2), size(ws)))
          .otherwise(array().cast("array<int>")),
        i => concat_ws(" ", element_at(ws, i - 1), element_at(ws, i)))).as("bg"))
    val bgModel = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("cnt2"))
      .orderBy(col("cnt2").desc, col("bg").asc).limit(bigramK)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    // denominator = FULL corpus count of the prefix word (exact
    // conditional probability); the join output is bigramK rows
    val bgModelD = counts.withColumnRenamed("w", "w1").withColumnRenamed("cntu", "cnt1")
      .join(broadcast(bgModel), Seq("w1"))
      .select(col("bg"), col("cnt2"), col("cnt1"))
    val scored = bigrams
      .join(broadcast(bgModelD), Seq("bg"), "left")
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(broadcast(uniModel), Seq("w2"), "left")
      .crossJoin(broadcast(total))
      .select(
        col(idCol),
        col("cnt2").isNotNull.cast("long").as("hit"),
        when(col("cnt2").isNotNull,
          log(col("cnt2").cast("double") / col("cnt1").cast("double")))
          .otherwise(log(lit(backoff) *
            (coalesce(col("cntu") + lit(1L), lit(1L)).cast("double") /
              (col("total") + lit(vocabK.toLong + 1L)).cast("double")))).as("logp"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("hit")).as("n_hits"),
        round(avg(col("logp")), 6).as("avg_logp"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("avg_logp"))
  }

  /** Vocabulary table from a prepared word-count relation `(w, cnt)`:
    * corpus-wide top-`topK` words with cumulative coverage of all
    * token occurrences, plus the distinct-type count. ONE shared
    * implementation of the arithmetic — the batch query (d16) and the
    * streaming twin (`DocStream.incrementalVocab`) both call it, so
    * snapshot-equals-batch is identity, not coincidence. The top-K is
    * `orderBy().limit(k)` — a distributed TakeOrdered, never a
    * single-reducer global window over the vocabulary; the cumulative
    * window then runs over exactly k rows.
    *
    * @return (rk, w, cnt, coverage, n_types)
    */
  def vocabFromCounts(counts: DataFrame, topK: Int): DataFrame = {
    val total = counts.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_types"))
    val top = counts.orderBy(col("cnt").desc, col("w").asc).limit(topK)
    val w = Window.orderBy(col("cnt").desc, col("w").asc)
    top
      .withColumn("rk", row_number().over(w))
      .withColumn("cum_cnt", sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(total))
      .select(
        col("rk"), col("w"), col("cnt"),
        round(col("cum_cnt").cast("double") / col("total").cast("double"), 6).as("coverage"),
        col("n_types"))
  }

  /** [[vocabFromCounts]] from the documents themselves (whitespace
    * tokens — the d16 batch query).
    */
  def vocabStats(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    vocabFromCounts(
      docs.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt")),
      topK)
}
