package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PrioritySample]] (X145) oracles: the sf0.001 sample matches a
  * literal driver replay of Duffield-Lund-Thorup priority sampling
  * (same LCG, same division, same tie-break), every sampled priority
  * clears τ, and the ŵ estimator is exactly max(w, τ).
  */
class PrioritySampleSpec extends AnyFunSuite with SparkSpec {

  test("q186 at sf0.001 == driver replay; priorities clear tau; " +
      "w_hat = max(w, tau)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val scored = docs.map { case (id, w) =>
      val u = ((id % 1000003L) * 1103515245L + 12345L) % 1000000L + 1L
      (id, w, u, (w * 1000000L).toDouble / u.toDouble)
    }.sortBy { case (id, _, _, pri) => (-pri, id) }
    val k = PrioritySample.K
    assert(docs.length > k + 1, "corpus must exceed the sample size")
    val tau = scored(k)._4
    val expected = scored.take(k).map { case (id, w, u, pri) =>
      (id, w, u, pri, math.max(w.toDouble, tau))
    }

    val got = PrioritySample.q186.build(spark, sf0001).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("w"), r.getAs[Long]("u"),
        r.getAs[Double]("priority"), r.getAs[Double]("w_hat")))
    assert(got.length === k)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 === e._1 && g._2 === e._2 && g._3 === e._3)
      assert(g._4 === e._4, s"priority of doc ${g._1} (bit-exact)")
      assert(g._5 === e._5, s"w_hat of doc ${g._1}")
    }
    got.foreach(g => assert(g._4 >= tau,
      "every sampled priority must clear tau"))
  }

  test("higher weight at equal u means higher priority (the sampling " +
      "is genuinely weight-proportional)") {
    // same u residue class: doc_ids congruent mod 1000003 share u
    val u = ((5L % 1000003L) * 1103515245L + 12345L) % 1000000L + 1L
    assert((2000L * 1000000L).toDouble / u > (100L * 1000000L).toDouble / u)
  }
}
