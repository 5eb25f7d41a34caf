package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MarketBasket.q242]] (X209) oracles: the same top-pair frame as
  * q167 (keys and counts equal row-for-row), the Kulczynski identity
  * kulc = (conf_ab + conf_ba)/2 bit-for-bit against q167's panel,
  * null-invariance bounds, and the one-sided-rule signature.
  */
class RuleInterestingnessSpec extends AnyFunSuite with SparkSpec {

  private lazy val q167rows = MarketBasket.q167
    .build(spark, sf0001).collect()
    .map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(6), r.getDouble(7)))).toMap

  private lazy val q242rows = MarketBasket.q242
    .build(spark, sf0001).collect()
    .map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap

  test("same rule set as q167; kulc == (conf_ab + conf_ba)/2 " +
      "bit-for-bit; cosine and imbalance match the driver tree") {
    assert(q242rows.keySet === q167rows.keySet && q242rows.nonEmpty)
    q242rows.foreach { case (k, (p, ca, cb, kulc, cosine, ir)) =>
      val (p167, ca167, cb167, confAb, confBa) = q167rows(k)
      assert((p, ca, cb) === ((p167, ca167, cb167)))
      assert(kulc === (confAb + confBa) / 2.0, s"kulc identity $k")
      assert(cosine ===
        p.toDouble / math.sqrt((ca * cb).toDouble), s"cosine $k")
      assert(ir ===
        math.abs(ca - cb).toDouble / (ca + cb - p).toDouble, s"ir $k")
    }
  }

  test("null-invariance bounds: every measure in [0, 1]; cosine <= " +
      "kulc (AM-GM on the two confidences)") {
    q242rows.values.foreach { case (_, _, _, kulc, cosine, ir) =>
      assert(kulc >= 0 && kulc <= 1 && cosine >= 0 && cosine <= 1 &&
        ir >= 0 && ir <= 1)
      assert(cosine <= kulc + 1e-12,
        "geometric mean of confidences cannot exceed their mean")
    }
  }
}
