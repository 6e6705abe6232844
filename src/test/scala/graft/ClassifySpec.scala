package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

class ClassifySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(docs: org.apache.spark.sql.DataFrame,
                    seed: org.apache.spark.sql.DataFrame,
                    threshold: Double = 0.0)
  : Map[Long, (Long, Double, Boolean)] =
    Classify.nbScore(docs, "doc_id", "text", seed, "doc_id", "lbl",
        threshold = threshold)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("log_odds"),
          r.getAs[Boolean]("keep"))))
      .toMap

  /** The naive in-memory NB reference: same smoothing, same 6dp
    * rounding discipline. */
  private def gold(seedDocs: Seq[(String, Boolean)], text: String,
                   alpha: Double = 1.0): Double = {
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tokens = seedDocs.flatMap { case (t, l) => t.split(" ").map(_ -> l) }
    val vocab = tokens.map(_._1).distinct
    val totP = tokens.count(_._2); val totN = tokens.size - totP
    val nP = seedDocs.count(_._2); val nN = seedDocs.size - nP
    def lr(w: String): Double = {
      val cP = tokens.count(t => t._1 == w && t._2)
      val cN = tokens.count(t => t._1 == w && !t._2)
      if (vocab.contains(w))
        r6(math.log((cP + alpha) / (totP + alpha * vocab.size)) -
           math.log((cN + alpha) / (totN + alpha * vocab.size)))
      else
        r6(math.log(alpha / (totP + alpha * vocab.size)) -
           math.log(alpha / (totN + alpha * vocab.size)))
    }
    val prior = r6(math.log(nP.toDouble / nN))
    // exact decimal sum of 6dp terms == double sum of 6dp terms here
    // (few small terms, well inside double's exact-integer range in
    // micro units)
    prior + text.split(" ").map(lr).sum
  }

  test("nbScore matches a hand-computed NB fit, including OOV and prior terms") {
    val seedTexts = Seq(
      (10L, "good clean prose text", true),
      (11L, "good text prose", true),
      (12L, "spam spam buy now", false))
    val docs = (seedTexts.map { case (id, t, _) => (id, t) } ++ Seq(
      (20L, "good prose"),
      (21L, "buy spam now"),
      (22L, "zzz qqq"))).toDF("doc_id", "text")
    val seed = seedTexts.map { case (id, _, l) => (id, l) }.toDF("doc_id", "lbl")
    val got = score(docs, seed)
    val seedPairs = seedTexts.map { case (_, t, l) => (t, l) }
    for ((id, text) <- Seq(20L -> "good prose", 21L -> "buy spam now",
                           22L -> "zzz qqq")) {
      val expected = gold(seedPairs, text)
      val (n, lo, keep) = got(id)
      assert(n == text.split(" ").length.toLong)
      assert(math.abs(lo - expected) < 1e-9, s"doc $id: $lo vs $expected")
      assert(keep == (lo >= 0.0))
    }
    // the learned model separates the held-out docs the right way
    assert(got(20L)._3 && !got(21L)._3)
    // an all-OOV doc scores prior + 2*oov — dominated by the class
    // with less seed mass (negative here has fewer tokens, so OOV
    // leans positive); just pin the exact value via gold
    assert(math.abs(got(22L)._2 - gold(seedPairs, "zzz qqq")) < 1e-9)
  }

  test("nbScore: threshold moves the keep boundary; null-text docs drop; token multiplicity counts") {
    val docs = Seq((1L, "ham ham ham"), (2L, "spam spam spam"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val seed = Seq((1L, true), (2L, false)).toDF("doc_id", "lbl")
    val base = score(docs, seed)
    assert(!base.contains(3L), "null-text doc must drop")
    assert(base(1L)._2 > 0 && base(2L)._2 < 0)
    // multinomial: tripled tokens triple the word's evidence (minus
    // prior): log_odds(1) - prior == 3 * lr(ham)
    val hi = score(docs, seed, threshold = 1e6)
    assert(hi.values.forall(!_._3), "nothing passes an unreachable threshold")
    intercept[IllegalArgumentException] {
      Classify.nbScore(docs, "doc_id", "text", seed, "doc_id", "lbl",
        threshold = Double.MaxValue)
    }
  }
}
