package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev utility: isolate the shingle-hashing cost — md5-per-shingle
  * MinHash (batch aggregation path) vs the native rolling-hash scalar
  * path — over the FULL documents table at the given sf dir (no LSH,
  * no candidate joins, no doc_id bound).
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[hashbench] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s ($n sigs)")
      }
    }
    time("md5 shingle minhash  ") {
      Dedup.minhashArrayFromShingles(
        Dedup.charShingles(docs, "doc_id", "text", 3), "doc_id", 64).count()
    }
    time("rolling-hash minhash ") {
      docs.select(col("doc_id"), Dedup.rollingMinhashSig(col("text"), 3, 64).as("sig")).count()
    }
    spark.stop()
  }
}
