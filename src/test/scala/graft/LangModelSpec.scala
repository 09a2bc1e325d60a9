package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangModel

/** Unigram LM scoring contract tests: hand-computed probabilities on
  * a tiny corpus, OOV accounting under a capped vocabulary, and the
  * empty-document edge.
  */
class LangModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def score(vocabK: Int, rows: (Long, String)*) = {
    import spark.implicits._
    LangModel.unigramScore(rows.toDF("doc_id", "text"), "doc_id", "text", vocabK)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))))
      .toMap
  }

  test("hand-computed probabilities on a 5-token corpus") {
    // corpus tokens: a a a b c  -> total=5; K=10 -> denom = 5+11 = 16
    // p(a)=(3+1)/16, p(b)=p(c)=(1+1)/16
    val out = score(10, 1L -> "a a a", 2L -> "b c")
    val pa = math.log(4.0 / 16.0)
    val pb = math.log(2.0 / 16.0)
    assert(out(1L)._1 == 3L && out(1L)._2 == 0L)
    assert(math.abs(out(1L)._3 - BigDecimal(pa).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(2L)._1 == 2L && out(2L)._2 == 0L)
    assert(math.abs(out(2L)._3 - BigDecimal(pb).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("vocabulary cap sends rare words to the OOV bucket") {
    // K=1: only the most frequent word ("the", cnt 4) is in-model;
    // every other token is OOV with p = 1/(total+2)
    val out = score(1,
      1L -> "the the the the",
      2L -> "rare words only here")
    assert(out(1L)._2 == 0L, "model word counted as OOV")
    assert(out(2L)._2 == 4L, s"expected all 4 tokens OOV, got ${out(2L)}")
    val total = 8L // 4 + 4 tokens
    val expected = math.log(1.0 / (total + 2.0))
    assert(math.abs(out(2L)._3 - BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // OOV scores below any in-model score
    assert(out(2L)._3 < out(1L)._3)
  }

  test("empty and whitespace-only docs score zero tokens with null avg") {
    val out = score(10, 1L -> "some real text", 2L -> "", 3L -> "   ")
    assert(out(2L)._1 == 0L && out(2L)._2 == 0L && out(2L)._3.isNaN)
    assert(out(3L)._1 == 0L && out(3L)._3.isNaN)
    assert(out(1L)._1 == 3L)
  }

  test("deterministic top-K tie-break: count desc then word asc") {
    // b and c tie at cnt=2; K=1 must pick b (asc) — c becomes OOV
    val out = score(1, 1L -> "b b c c")
    // total=4, K=1 -> denom = 4+2 = 6; p(b)=(2+1)/6, p(c OOV)=1/6
    val exp = (math.log(3.0 / 6.0) + math.log(3.0 / 6.0) +
      math.log(1.0 / 6.0) + math.log(1.0 / 6.0)) / 4.0
    assert(out(1L)._2 == 2L, s"exactly the two c tokens should be OOV: ${out(1L)}")
    assert(math.abs(out(1L)._3 - BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
