package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame

/** Dev utility: corpus-scale throughput probe for the curation
  * family (the LLM-pipeline counterpart of ProbeFleetScale). The
  * sf0.1 documents table is replicated R× with disjoint id ranges and
  * the c01 composition (signals → fp-window dedup → rule filter →
  * budget selection → epoch order) plus the d07/d12 dedup kernels run
  * end to end at each multiple — the linearity of rows/s across R is
  * the evidence that no stage hides a super-linear step (driver
  * collect, single-task window, all-pairs join).
  *
  * Replication makes every document an exact R-way near-dup, which is
  * the ADVERSARIAL shape for the fp window and the LSH bucket join
  * (maximum group fan-in), not the easy one.
  */
object ProbeCorpusScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(4, 16, 64)
    val spark = GraftSession.local()
    import graft.sources.Tables
    import graft.operators.{TextOps, Mixing, Dedup}

    def corpus(r: Int): DataFrame =
      Tables.documents(spark, sfDir)
        .crossJoin(spark.range(r).select(col("id").as("__rep")))
        .select((col("doc_id") * r + col("__rep")).as("doc_id"),
          col("source"), col("lang"), col("text"))

    def tm(name: String, rows: Long)(f: => Long): Unit = {
      val a = System.nanoTime(); val n = f; val b = System.nanoTime()
      val s = (b - a) / 1e9
      println(f"[corpus-scale] $name%-22s rows=$rows%9d  $s%7.3f s  ${rows / s / 1e6}%6.2f M rows/s ($n out)")
    }

    reps.foreach { r =>
      val docs = corpus(r)
      val rows = 5000L * r
      println(s"[corpus-scale] == replication $r ==")
      // c01 composition (same operators, same thresholds)
      tm("signals+dedup window", rows) {
        val byFp = Window.partitionBy(col("fp"))
        docs.select(col("doc_id"),
            TextOps.prefixFingerprint(col("text"), 40).as("fp"),
            TextOps.tokenCount(col("text")).cast("long").as("tokens"),
            TextOps.qualityScore(col("text")).as("quality"),
            TextOps.dupNgramFrac(col("text"), 2).as("dup_bigram_frac"))
          .withColumn("dedup_keep", col("doc_id") === min(col("doc_id")).over(byFp))
          .filter(col("dedup_keep")).count()
      }
      tm("budgetSelect", rows) {
        Mixing.budgetSelect(docs, "doc_id",
          TextOps.tokenCount(col("text")), TextOps.qualityScore(col("text")),
          budget = 1200L * r).filter(col("kept")).count()
      }
      tm("epoch order", rows) {
        Mixing.globalRankInGroup(
          docs.select(col("doc_id")).withColumn("epoch", lit(0))
            .withColumn("shuffle_key", Mixing.epochShuffleKey(col("doc_id"), col("epoch"))),
          "epoch", "shuffle_key", "doc_id", "pos").count()
      }
      tm("minhash sigs (d12)", rows) {
        // aggregate forces the signature compute (count() would prune it)
        docs.select(Dedup.rollingMinhashSig(col("text"), 3, 64).as("sig"))
          .select(sum(element_at(col("sig"), 1))).collect()
        rows
      }
      tm("lsh star edges", rows) {
        // replication drives every LSH bucket to size r, so the PAIR
        // join would emit r²/2 per bucket — the star-edge form (one
        // edge per member to the bucket min) is the linear scale path
        // and exactly what this shape stresses
        val sigs = docs.select(col("doc_id"),
          Dedup.rollingMinhashSig(col("text"), 3, 64).as("sig"))
        val bands = sigs.select(col("doc_id"),
            explode(Dedup.bandsFromSig(col("sig"), 64, 4)).as("bs"))
          .select(col("doc_id"), col("bs.band").as("band"), col("bs.band_sig").as("band_sig"))
        Dedup.lshStarEdges(bands, "doc_id").count()
      }
    }
    spark.stop()
  }
}
