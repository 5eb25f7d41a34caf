package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TargetEncoding]] (X129) oracles: the m-estimate encoding is a
  * weighted average of raw rate and prior (so it always lies between
  * them); the leave-one-out identities — a singleton category's LOO
  * encoding collapses to the pure prior (its one removed row leaves
  * nothing behind), enc_loo_pos is NULL when no positive row exists to
  * consume it, enc_loo_neg NULL when no negative row does; and the
  * full q171 output at sf0.001 honors the same invariants.
  */
class TargetEncodingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val M = TargetEncoding.M.toDouble

  // A(2/3 pos), B(singleton pos), C(singleton neg), D(all neg), E(all pos)
  private lazy val planted = Seq(
    ("A", 1L), ("A", 1L), ("A", 0L),
    ("B", 1L),
    ("C", 0L),
    ("D", 0L), ("D", 0L),
    ("E", 1L), ("E", 1L)).toDF("cat", "y")

  private lazy val out = TargetEncoding.encode(planted, Seq("cat"))
    .orderBy("cat").collect()
    .map(r => r.getAs[String]("cat") -> r).toMap

  private val prior = 5.0 / 9.0

  test("prior and per-category counts are exact") {
    assert(out.size === 5)
    out.values.foreach(r => assert(r.getAs[Double]("prior") === prior))
    assert(out("A").getAs[Long]("n_c") === 3L)
    assert(out("A").getAs[Long]("pos_c") === 2L)
  }

  test("enc is the m-estimate: exact same double tree, and always " +
      "between raw_rate and prior") {
    out.values.foreach { r =>
      val (n, p) = (r.getAs[Long]("n_c"), r.getAs[Long]("pos_c"))
      assert(r.getAs[Double]("enc") ===
        (p.toDouble + M * prior) / (n.toDouble + M))
      val (raw, e) = (r.getAs[Double]("raw_rate"), r.getAs[Double]("enc"))
      assert(e >= math.min(raw, prior) && e <= math.max(raw, prior))
      assert(math.abs(e - prior) <= math.abs(raw - prior),
        "smoothing must shrink toward the prior")
    }
  }

  test("singleton LOO collapses to the pure prior") {
    // B: 1 row, y=1 → removing it leaves (0 + m*prior) / (0 + m)
    assert(math.abs(out("B").getAs[Double]("enc_loo_pos") - prior) < 1e-15)
    // C: 1 row, y=0 → enc_loo_neg = (0 + m*prior) / (0 + m)
    assert(math.abs(out("C").getAs[Double]("enc_loo_neg") - prior) < 1e-15)
  }

  test("LOO columns are NULL exactly where no row exists to read them") {
    def isNull(cat: String, f: String) =
      out(cat).isNullAt(out(cat).fieldIndex(f))
    assert(isNull("B", "enc_loo_neg"), "all-pos category has no neg row")
    assert(isNull("C", "enc_loo_pos"), "all-neg category has no pos row")
    assert(isNull("D", "enc_loo_pos"))
    assert(isNull("E", "enc_loo_neg"))
    assert(!isNull("A", "enc_loo_pos") && !isNull("A", "enc_loo_neg"))
  }

  test("mixed category LOO matches the closed form") {
    val a = out("A")
    assert(a.getAs[Double]("enc_loo_pos") ===
      (1.0 + M * prior) / (2.0 + M))
    assert(a.getAs[Double]("enc_loo_neg") ===
      (2.0 + M * prior) / (2.0 + M))
  }

  test("q171 at sf0.001: every enc between raw_rate and prior; LOO " +
      "nulls only where mandated") {
    val rows = TargetEncoding.q171.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, e, pr) = (r.getAs[Double]("raw_rate"),
        r.getAs[Double]("enc"), r.getAs[Double]("prior"))
      assert(e >= math.min(raw, pr) && e <= math.max(raw, pr))
      val (n, p) = (r.getAs[Long]("n_c"), r.getAs[Long]("pos_c"))
      assert(r.isNullAt(r.fieldIndex("enc_loo_pos")) === (p == 0L))
      assert(r.isNullAt(r.fieldIndex("enc_loo_neg")) === (p == n))
    }
  }
}
