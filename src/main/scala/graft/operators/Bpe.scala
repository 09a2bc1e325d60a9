package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"). The distributed shape is the one real tokenizer trainers
  * use: the corpus is aggregated ONCE into a word histogram (shuffle
  * cardinality = vocabulary size, not corpus size), the merge loop
  * then runs over that histogram only — at 100 TB the corpus is
  * touched exactly once, and the iterative part never sees it.
  * Encoding broadcasts the merge table and maps each document with a
  * per-partition word→tokens memo (vocabulary is Zipfian, so the memo
  * hit rate is near 1).
  *
  * Everything is deterministic: merge selection is (count desc, pair
  * lexicographic), with no RNG and no float arithmetic anywhere.
  */
object Bpe {

  /** End-of-word marker, appended as its own symbol. */
  val Eow = "</w>"

  private[operators] def mergePair(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { b += (l + r); i += 2 }
      else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Train up to `numMerges` merges from a word histogram. Returns
    * merges in priority order with the adjacent-pair count each one
    * had when selected. Stops early when no adjacent pair remains.
    *
    * Incremental trainer: a pair→count map plus a pair→words inverted
    * index, both updated only for the words that CONTAIN the selected
    * pair — each iteration costs O(support of the merged pair) plus
    * one scan of the pair map for the argmax, instead of re-counting
    * the whole histogram (the merged pair's support is typically a
    * tiny fraction of a million-word vocabulary).
    */
  def trainMerges(wordCounts: Iterable[(String, Long)], numMerges: Int): Vector[(String, String, Long)] = {
    val words = wordCounts.toArray.map { case (w, c) =>
      (w.map(_.toString).toVector :+ Eow, c)
    }
    val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val where = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def index(i: Int, syms: Vector[String], c: Long, sign: Long): Unit = {
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val n = counts(p) + sign * c
        if (n <= 0) counts.remove(p) else counts(p) = n
        if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += i
        else where.get(p).foreach(_ -= i)
        j += 1
      }
    }
    for (i <- words.indices) index(i, words(i)._1, words(i)._2, 1L)
    val out = Vector.newBuilder[(String, String, Long)]
    var k = 0
    while (k < numMerges && counts.nonEmpty) {
      val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      out += ((l, r, c))
      val members = where.getOrElse((l, r), mutable.Set.empty).toArray
      for (i <- members) {
        val (syms, wc) = words(i)
        index(i, syms, wc, -1L)
        val merged = mergePair(syms, l, r)
        words(i) = (merged, wc)
        index(i, merged, wc, 1L)
      }
      k += 1
    }
    out.result()
  }

  /** Encode one word with a trained merge list (priority order). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    for ((l, r) <- merges) syms = mergePair(syms, l, r)
    syms
  }

  /** The corpus word histogram: one `groupBy(word)` — the single
    * corpus-wide shuffle in BPE training, with map-side partial
    * aggregation and output cardinality = |vocabulary|.
    */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Train merges straight from a corpus: the histogram collects to
    * the driver — it is vocabulary-sized, the same reduction every
    * production tokenizer trainer performs before its merge loop —
    * and is CAPPED at the `maxVocab` most frequent words (TakeOrdered
    * with a (count desc, word) total order) so driver memory stays
    * bounded on an unbounded-vocabulary corpus; rare-word truncation
    * is exactly the min-frequency pruning real trainers apply.
    * The single source of truth for d25 (merge table) and d26
    * (encoding) — both must train on identical merges.
    */
  def trainFromCorpus(docs: DataFrame, textCol: String, numMerges: Int,
                      maxVocab: Int = 1 << 20): Vector[(String, String, Long)] = {
    val hist = wordHistogram(docs, textCol)
      .orderBy(col("cnt").desc, col("word").asc).limit(maxVocab).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainMerges(hist, numMerges)
  }

  /** Trained merge table as a DataFrame: (rank, left, right,
    * pair_count).
    */
  def merges(spark: SparkSession, docs: DataFrame, textCol: String, numMerges: Int,
             maxVocab: Int = 1 << 20): DataFrame = {
    val m = trainFromCorpus(docs, textCol, numMerges, maxVocab).zipWithIndex.map {
      case ((l, r, c), i) => (i.toLong, l, r, c)
    }
    spark.createDataFrame(m).toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** Per-document BPE token counts under a broadcast merge table.
    * Typed map over (id, text) — no shuffle; the per-partition memo
    * makes the cost per row ~the number of DISTINCT words in it.
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  mergeList: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(mergeList.toVector)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val merges = bc.value
        val memo = mutable.Map.empty[String, Int]
        it.map { case (id, text) =>
          val ws = text.trim.split("\\s+").filter(_.nonEmpty)
          var total = 0L
          ws.foreach { w =>
            total += memo.getOrElseUpdate(w, encodeWord(w, merges).length)
          }
          (id, ws.length.toLong, total)
        }
      }
      .toDF(idCol, "n_words", "n_bpe_tokens")
  }
}
