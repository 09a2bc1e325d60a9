package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev utility: micro-timing of the c01 curation pipeline's pieces
  * (VERDICT r9 #4). Each probe FORCES the column compute with a
  * hash-sum aggregate so column pruning can't skip the work.
  */
object ProfC01 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    import spark.implicits._
    import graft.sources.Tables
    import graft.operators.{TextOps, Mixing}

    def tm(name: String)(f: => Any): Unit = {
      val a = System.nanoTime(); val n = f; val b = System.nanoTime()
      println(f"[profc01] $name%-28s ${(b - a) / 1e9}%.3f s ($n)")
    }
    def force(df: org.apache.spark.sql.DataFrame): Any = {
      val h = df.columns.map(c => col(c).cast("string")).reduce(concat_ws("|", _, _))
      df.select(sum(crc32(h))).collect()(0)
    }
    (1 to 3).foreach { pass =>
      println(s"[profc01] -- pass $pass --")
      val docs = Tables.documents(spark, sfDir)
      tm("scan text")(force(docs.select(col("doc_id"), col("text"))))
      tm("tokenCount")(force(docs.select(TextOps.tokenCount(col("text")).as("t"))))
      tm("quality")(force(docs.select(TextOps.qualityScore(col("text")).as("q"))))
      tm("dupNgramFrac")(force(docs.select(TextOps.dupNgramFrac(col("text"), 2).as("d"))))
      tm("prefixFp")(force(docs.select(TextOps.prefixFingerprint(col("text"), 40).as("f"))))
      val sig = docs.select(col("doc_id"),
        TextOps.prefixFingerprint(col("text"), 40).as("fp"),
        TextOps.tokenCount(col("text")).cast("long").as("tokens"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.dupNgramFrac(col("text"), 2).as("dup_bigram_frac"))
      tm("all signals")(force(sig))
      val byFp = Window.partitionBy(col("fp"))
      val flagsDf = sig
        .withColumn("dedup_keep", col("doc_id") === min(col("doc_id")).over(byFp))
        .withColumn("ok_words", col("tokens").between(50L, 100000L))
        .withColumn("ok_rep", col("dup_bigram_frac") <= 0.05)
        .withColumn("eligible", col("dedup_keep") && col("ok_words") && col("ok_rep"))
        .select(col("doc_id"), col("dedup_keep"), col("ok_words"), col("ok_rep"), col("eligible"),
          col("tokens"), col("quality"))
      tm("signals+window")(force(flagsDf))
      val flagsRdd = flagsDf.as[(Long, Boolean, Boolean, Boolean, Boolean, Long, Double)]
        .rdd.setName("probe flags").persist()
      tm("rdd persist count")(flagsRdd.count())
      val flags = spark.createDataset(flagsRdd)
        .toDF("doc_id", "dedup_keep", "ok_words", "ok_rep", "eligible", "tokens", "quality")
      var sel0: org.apache.spark.sql.DataFrame = null
      tm("budgetSelect build+collect")({ sel0 = Mixing.budgetSelect(flags.filter(col("eligible")), "doc_id",
        col("tokens"), col("quality"), 6000L).select(col("doc_id"), col("kept")); "built" })
      tm("budgetSelect eval")(force(sel0))
      val selRdd = sel0.as[(Long, Boolean)].rdd.persist()
      tm("sel rdd persist")(selRdd.count())
      val sel = spark.createDataset(selRdd).toDF("doc_id", "kept")
      val ordered = Mixing.globalRankInGroup(
          sel.filter(col("kept")).withColumn("epoch", lit(0))
            .withColumn("shuffle_key", Mixing.epochShuffleKey(col("doc_id"), col("epoch"))),
          "epoch", "shuffle_key", "doc_id", "pos")
        .select(col("doc_id"), col("pos"))
      tm("rank eval")(force(ordered))
      val fin = flags.select(col("doc_id"), col("dedup_keep"), col("ok_words"), col("ok_rep"), col("eligible"))
        .join(sel, Seq("doc_id"), "left")
        .join(ordered, Seq("doc_id"), "left")
        .withColumn("selected", coalesce(col("kept"), lit(false)))
      tm("final joins")(force(fin))
      tm("c01 e2e count")(SparkEntry.queries("c01_corpus_pipeline")(spark, sfDir).count())
      flagsRdd.unpersist(); selRdd.unpersist()
    }
    spark.stop()
  }
}
