package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Robust winnowing (SIGMOD 2003) contract tests: the fingerprint
  * guarantee, the density bound, and tie determinism.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("every shared substring of length >= w+k-1 yields a shared fingerprint") {
    // k=5, w=4: guarantee threshold is 8 normalized chars. The two
    // docs share a 40-char passage embedded in different surroundings.
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = docs(
      1L -> s"HEADER ALPHA $shared TRAILER ONE",
      2L -> s"completely different opening text $shared and a different ending"
    )
    val fp = Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4)
    val pairs = Dedup.winnowPairs(fp, "doc_id", maxDocsPerHash = 10).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("n_shared") >= 1, "shared passage produced no shared fingerprint")
  }

  test("disjoint documents share no fingerprints") {
    val df = docs(
      1L -> "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii",
      2L -> "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr"
    )
    val fp = Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4)
    assert(Dedup.winnowPairs(fp, "doc_id", maxDocsPerHash = 10).count() == 0)
  }

  test("fingerprint density is ~2/(w+1) of k-grams, never empty for long docs") {
    val text = (1 to 50).map(i => s"sentence number $i with some filler words").mkString(" ")
    val fp = Dedup.winnowFingerprints(docs(1L -> text), "doc_id", "text", 5, 4)
    val n = fp.count().toDouble
    val grams = text.toLowerCase.replaceAll("[^a-z0-9]", "").length - 4
    // expected density 2/(w+1) = 0.4; allow a wide band — the point is
    // "a small fraction, not zero and not all"
    assert(n > grams * 0.15 && n < grams * 0.7, s"selected $n of $grams k-gram hashes")
  }

  test("scalar winnowFpArray is value-identical to the window-aggregate operator") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 150).select("doc_id", "text")
    val scalar = d.select(col("doc_id"), explode(Dedup.winnowFpArray(col("text"), 5, 4)).as("fp"))
      .select(col("doc_id"), col("fp.fp_pos").as("fp_pos"), col("fp.fp_hash").as("fp_hash"))
    val agg = Dedup.winnowFingerprints(d, "doc_id", "text", 5, 4)
    assert(scalar.except(agg).count() == 0 && agg.except(scalar).count() == 0,
      "scalar and window-aggregate winnowing diverge")
  }

  test("both Spark paths agree with an independent plain-Scala winnowing on random inputs") {
    // three implementations, one definition: window-aggregate SQL,
    // scalar array expression, and a direct per-string fold
    def refWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
      val norm = text.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]", "")
      val nGrams = math.min(norm.length - (k - 1), 65535)
      if (nGrams < w) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(s: String): Long = {
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(11), 16)
      }
      val keys = (1 to nGrams).map(pos => h(norm.substring(pos - 1, pos - 1 + k)) * 65536L + (65535L - pos))
      (0 until nGrams - (w - 1)).map(i => keys.slice(i, i + w).min)
        .toSet[Long].map(m => ((65535L - m % 65536L).toInt, m >> 16))
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ019 .,!?-_éñ中\t"
    val texts = (0 until 60).map { i =>
      val len = rnd.nextInt(120)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    } :+ (60L -> "") :+ (61L -> "aaaaaaaaaaaaaaaa") :+ (62L -> ("xy" * 300))
    import spark.implicits._
    val df = texts.toDF("doc_id", "text").cache()
    def collectFps(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[(Int, Long)]] =
      rows.map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
        .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    val agg = collectFps(Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4).collect())
    val scalar = collectFps(df.select(col("doc_id"),
      explode(Dedup.winnowFpArray(col("text"), 5, 4)).as("fp"))
      .select(col("doc_id"), col("fp.fp_pos"), col("fp.fp_hash")).collect())
    texts.foreach { case (id, text) =>
      val expect = refWinnow(text, 5, 4)
      assert(agg.getOrElse(id, Set.empty) == expect, s"window-aggregate path diverges on doc $id: '$text'")
      assert(scalar.getOrElse(id, Set.empty) == expect, s"scalar path diverges on doc $id: '$text'")
    }
  }

  test("short documents yield no fingerprints; selection is deterministic") {
    val df = docs(1L -> "ab c", 2L -> "repeat repeat repeat repeat")
    val fp = Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4)
    assert(fp.filter("doc_id = 1").count() == 0)
    // identical k-grams in one window tie on hash: rightmost wins,
    // and two runs select the identical (pos, hash) set
    val a = fp.filter("doc_id = 2").collect().map(r => (r.getInt(1), r.getLong(2))).sorted
    val b = Dedup.winnowFingerprints(df, "doc_id", "text", 5, 4)
      .filter("doc_id = 2").collect().map(r => (r.getInt(1), r.getLong(2))).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }
}
