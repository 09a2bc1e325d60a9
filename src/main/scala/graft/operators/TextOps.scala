package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristics, document
  * fingerprinting. All pure column expressions (codegen'd), evaluated
  * scan-side — at 100 TB these run inside the parquet scan stage with
  * zero shuffle.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** A BPE-ish subword proxy: whitespace tokens plus a length-based
    * continuation term — a cheap, deterministic stand-in for tokenizer
    * counts at corpus scale.
    */
  def approxBpeTokens(text: Column): Column =
    tokenCount(text).cast("long") + floor(length(text) / lit(16.0))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Uppercase character ratio. */
  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for", "with", "as", "at", "by")

  /** Fraction of whitespace tokens that are English stopwords —
    * the n-gram-free core of a language-ID heuristic.
    */
  def stopwordRatio(text: Column): Column = {
    // native one-pass expression ([[graft.functions.StopwordRatio]]):
    // the filter-lambda tree was CodegenFallback (see dupNgramFrac)
    graft.functions.GraftFunctions.ensure()
    call_function("graft_stopword_ratio", text)
  }

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length band + low punctuation +
    * stopword presence (the reference-style density/linearity scoring
    * idea applied to text, cf. `data_quality.py:13-25`).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 10.0)
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    // scale-0 product quantizer, not round(x, 6): the score is a
    // ratio of small integers (…/words/3), which hits 7th-decimal-half
    // shortest reprs where JVM (decimal-string) and C (scaled-product)
    // rounding disagree — the q64 bug class (see Study.scaleParams)
    round((lenScore + punctScore + stopScore) / 3.0 * lit(1e6)) / lit(1e6)
  }

  /** Predicted language: "en" when the stopword ratio clears a
    * threshold, else "unknown" — a deterministic n-gram-heuristic
    * stand-in suitable for corpus triage.
    */
  def langId(text: Column): Column =
    when(stopwordRatio(text) >= 0.05, lit("en")).otherwise(lit("unknown"))

  /** Canonical-content fingerprint: md5 of lowercased text with all
    * non-alphanumerics removed. Identical content → identical digest,
    * robust to spacing/punctuation edits.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Prefix fingerprint: digest of the first `n` normalized chars —
    * a cheap near-dup key (documents sharing an opening passage).
    */
  def prefixFingerprint(text: Column, n: Int): Column =
    md5(substring(regexp_replace(lower(text), "[^a-z0-9]", ""), 1, n))

  /** Duplicate word-n-gram fraction (the standard intra-document
    * repetition quality signal): 1 − distinct/total over the doc's
    * word n-grams, computed entirely in-row (array expressions, no
    * shuffle — a pure map over the corpus at any scale). A doc
    * shorter than n words contributes its single whole-text "gram"
    * (fraction 0).
    */
  def dupNgramFrac(text: Column, n: Int): Column = {
    // native one-pass expression ([[graft.functions.DupNgramFrac]]):
    // the equivalent transform/slice/array_distinct tree is lambda-
    // based (CodegenFallback) and was the measured CPU floor of the
    // whole rule-filter path
    graft.functions.GraftFunctions.ensure()
    val raw = call_function("graft_dup_ngram_frac", text, lit(n))
    // product quantizer (q64 class): a small-integer ratio's shortest
    // repr can terminate in a 7th-decimal 5
    round(raw * lit(1e6)) / lit(1e6)
  }

  /** The Gopher rule stopword set (Rae et al. 2021 §A1.1: a document
    * must contain at least two of these to pass the rule filter).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Fraction of whitespace tokens containing at least one alphabetic
    * character (the Gopher "80% of words contain an alphabetic
    * character" rule). In-row, codegen'd — a pure map at any scale.
    */
  def alphaWordFrac(text: Column): Column = {
    // native one-pass expression ([[graft.functions.AlphaWordFrac]]):
    // the tree ran an rlike PER TOKEN inside a CodegenFallback lambda
    graft.functions.GraftFunctions.ensure()
    call_function("graft_alpha_word_frac", text)
  }

  /** Number of DISTINCT [[GopherStopwords]] present in the document
    * (token-exact, lowercased).
    */
  def stopwordHits(text: Column): Column =
    size(array_intersect(
      array_distinct(split(lower(trim(text)), "\\s+")),
      array(GopherStopwords.map(lit): _*)))

  /** The word n-gram array of a document, DISTINCT, built in-row (the
    * docs-shorter-than-n edge contributes its single whole-text gram).
    */
  def wordNgramArray(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    array_distinct(transform(
      sequence(lit(1), greatest(size(words) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(words, i, lit(n)))
    ))
  }

  /** Sliding token-window chunk array: each element is a struct
    * `(chunk_idx, start_tok, n_tokens, chunk_hash)` for the window of
    * `window` whitespace tokens starting every `stride` tokens — the
    * fixed-context chunking a training pipeline runs before packing
    * (and a RAG pipeline before embedding). The chunk COUNT is
    * `1 + ceil(max(n - window, 0) / stride)`, so the final window
    * always reaches the last token and short docs yield exactly one
    * chunk. Built entirely in-row (sequence/transform/slice): at
    * 100 TB the explode that follows multiplies rows but the chunker
    * itself never shuffles.
    */
  def tokenChunks(text: Column, window: Int, stride: Int): Column = {
    val words = split(trim(text), "\\s+")
    val n = size(words)
    val nChunks = (lit(1) + ceil(greatest(n - window, lit(0)).cast("double") / stride)).cast("int")
    transform(
      sequence(lit(1), nChunks),
      i => {
        val start = lit(1) + (i - 1) * stride
        struct(
          (i - 1).cast("long").as("chunk_idx"),
          start.cast("long").as("start_tok"),
          least(lit(window), n - start + 1).cast("long").as("n_tokens"),
          md5(concat_ws(" ", slice(words, start, lit(window)))).as("chunk_hash"))
      }
    )
  }

  /** PII detector patterns (the C4/Dolma/FineWeb redaction step).
    * Deliberately restricted to syntax RE2 and java.util.regex share
    * (no lookaround, no backreferences) so the same pattern is
    * replayable on any engine's regex for cross-checking. These are
    * the standard high-precision curation patterns, not validators —
    * e.g. the IPv4 pattern accepts octets > 255, as the published
    * pipelines' versions do.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3}[-. ]?[0-9]{2,4}\\b"

  /** Per-document PII hit counts `(n_email, n_ipv4, n_phone)` — pure
    * column expressions, zero shuffle (the scan-stage pre-pass that
    * decides whether the redaction rewrite runs at all).
    */
  def piiCounts(text: Column): Column =
    struct(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_email"),
      size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long").as("n_ipv4"),
      size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long").as("n_phone"))

  /** PII-redacted text: each match class replaced by a fixed tag
    * (emails first — an email must not be half-eaten by the phone
    * pattern's digit runs). In-row rewrite; at 100 TB this is a pure
    * map over the scan.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Count-Min counter table over a word column: `depth × width`
    * counter rows from ONE map-side-combined aggregation — output
    * cardinality d·w at any corpus size, the constant-memory property
    * that makes frequency dashboards possible at 100 TB. The row
    * fan-out is an in-row explode of the depth indices (no join), so
    * the shuffle carries d·w partials per task. The ONE definition of
    * the sketch arithmetic: the d38 batch gate and the streaming twin
    * both call it, so batch/stream equality is identity, not
    * coincidence (the clear-day lesson).
    */
  /** Row `r`'s counter index for `word` — the sketch's hash schedule,
    * shared between the counter build and every probe.
    */
  def cmsBucket(word: Column, r: Column, width: Int): Column =
    conv(substring(md5(concat(word, lit(":cms:"), r.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width

  def cmsCounters(words: org.apache.spark.sql.DataFrame, wordCol: String,
                  depth: Int, width: Int): org.apache.spark.sql.DataFrame =
    words
      .select(col(wordCol).as("w"),
        explode(typedLit((0 until depth).toArray)).as("r"))
      .withColumn("b", cmsBucket(col("w"), col("r"), width))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** Hashed-feature Naive-Bayes quality classifier — the trainable
    * twin of the fastText-style quality filters every curation
    * pipeline runs (CCNet / DCLM / FineWeb seed-vs-crawl scoring),
    * re-expressed as pure relational algebra with NOTHING iterative:
    *
    *  1. tokens hash into `buckets` feature slots (the md5 31-bit
    *     base hash — cross-engine reproducible);
    *  2. per-slot class counts under the `goodIf` label make the
    *     multinomial NB log-likelihood-ratio weights with add-one
    *     smoothing — ONE map-side-combined aggregation, `buckets`
    *     rows total at any corpus size;
    *  3. each document's score is the sum of its tokens' weights.
    *
    * Weights are quantized to integer MICROS before the per-doc sum
    * (the q52/q56 lesson): integer sums are exact and
    * summation-order-free, so the scores hash-match any engine and
    * any partitioning — no float-accumulation drift at the verdict
    * boundary. Two corpus scans, a `buckets`-row broadcast, no joins
    * wider than the corpus: the 100 TB plan shape.
    *
    * @param goodIf boolean column marking the positive ("seed") class
    * @return (idCol, n_toks, score_micro, quality = score > 0)
    */
  def nbQualityScores(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      goodIf: Column,
      buckets: Int = 256
  ): org.apache.spark.sql.DataFrame = {
    // coalesce the label once: a null goodIf would otherwise count the
    // token in NEITHER class (when(!null) is null → otherwise 0),
    // while the SQL oracle's CASE WHEN good THEN .. ELSE .. counts it
    // as bad — null labels belong to the negative class
    val toks = df
      .select(col(idCol), coalesce(goodIf, lit(false)).as("__good"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("bucket", Dedup.baseHash31(col("tok")) % buckets)
    val counts = toks.groupBy(col("bucket")).agg(
      sum(when(col("__good"), 1L).otherwise(0L)).as("c_good"),
      sum(when(!col("__good"), 1L).otherwise(0L)).as("c_bad"))
    val tot = counts.agg(
      sum(col("c_good")).as("t_good"), sum(col("c_bad")).as("t_bad"))
    val d = lit(buckets.toDouble)
    val w = counts.crossJoin(broadcast(tot))
      .withColumn("w_micro",
        round((log((col("c_good") + 1.0) / (col("t_good") + d))
          - log((col("c_bad") + 1.0) / (col("t_bad") + d))) * 1e6, 0).cast("long"))
      .select(col("bucket"), col("w_micro"))
    toks
      .join(broadcast(w), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("w_micro")).as("score_micro"))
      .withColumn("quality", col("score_micro") > 0)
  }

}
