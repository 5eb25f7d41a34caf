package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[KappaAgreement]] (X108) oracles on planted rater structures:
  * κ = 1 exactly under perfect agreement, κ ≈ 0 under independent
  * raters even at HIGH raw agreement (the chance correction doing its
  * job — the property raw agreement lacks), and exact equality with a
  * driver-side computation on a skewed confusion matrix.
  */
class KappaAgreementSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Build a documents dir where the two q155 judges (n_chars buckets
    * at 200/800; token buckets at 40/160) land on chosen classes:
    * class 0 = low/low-ish, 1 = mid, 2 = high for each rater
    * independently.
    */
  private def docsFor(pairs: Seq[(Int, Int)]): String = {
    val dir = tmpDir("kappa")
    // chars per class: 100 / 400 / 1000; tokens per class: 20 / 80 / 200
    def text(tokens: Int): String = Seq.fill(tokens)("w").mkString(" ")
    pairs.zipWithIndex.map { case ((ca, cb), i) =>
      val nChars = Seq(100L, 400L, 1000L)(ca)
      val toks = Seq(20, 80, 200)(cb)
      (i.toLong, text(toks), "en", "s", nChars)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(pairs: Seq[(Int, Int)]): (Long, Long, Double, Double,
      Double) = {
    val r = KappaAgreement.q155.build(spark, docsFor(pairs)).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
  }

  test("perfect agreement gives kappa = 1 exactly") {
    val (n, agree, po, _, kappa) =
      run((0 until 90).map(i => (i % 3, i % 3)))
    assert(n === 90L && agree === 90L && po === 1.0 && kappa === 1.0)
  }

  test("independent raters give kappa ~ 0 even though raw agreement " +
      "is far from 0 (the chance correction)") {
    // uniform independent: every (ca, cb) cell equally often
    val (_, _, po, pe, kappa) =
      run(for (a <- 0 until 3; b <- 0 until 3; _ <- 0 until 10)
        yield (a, b))
    assert(po === pe, "uniform independence: observed == expected")
    assert(kappa === 0.0)
  }

  test("skewed matrix equals the driver-side computation exactly") {
    // 80% of docs in class 0 for both raters, disagreements planted
    val pairs = Seq.fill(80)((0, 0)) ++ Seq.fill(10)((0, 1)) ++
      Seq.fill(5)((1, 0)) ++ Seq.fill(5)((2, 2))
    val (n, agree, po, pe, kappa) = run(pairs)
    val cm = pairs.groupBy(identity).view.mapValues(_.size).toMap
    val nn = pairs.size.toDouble
    val poD = pairs.count(p => p._1 == p._2) / nn
    val rm = (0 to 2).map(k => pairs.count(_._1 == k).toLong)
    val cmm = (0 to 2).map(k => pairs.count(_._2 == k).toLong)
    val peD = (0 to 2).map(k => rm(k) * cmm(k)).sum / (nn * nn)
    val kD = (poD - peD) / (1.0 - peD)
    assert(n === 100L && agree === 85L)
    assert(po === math.rint(poD * 1e6) / 1e6)
    assert(pe === math.rint(peD * 1e6) / 1e6)
    assert(kappa === math.rint(kD * 1e6) / 1e6)
    // raw agreement looks decent; kappa exposes the base-rate freebie
    assert(po > 0.8 && kappa < 0.6)
  }
}
