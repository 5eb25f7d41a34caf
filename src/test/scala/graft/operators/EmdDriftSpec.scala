package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[EmdDrift]] (X196) oracles: identical distributions → W₁ exactly
  * 0; a pure +k location shift → W₁ exactly k with mean_shift ±k (the
  * property KS saturates on); the signed area ≡ exact mean
  * difference on an asymmetric plant; sf0.001 ≡ a driver replay.
  */
class EmdDriftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(String, Long)]) // (source, n_chars)
      : Map[(String, String), (Long, Long, Long, Double, Double)] = {
    val dir = tmpDir("emd")
    docs.zipWithIndex.map { case ((src, n), i) =>
      (i.toLong, "t", "en", src, n)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    EmdDrift.q232.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    }.toMap
  }

  test("identical distributions: W1 exactly 0") {
    val a = Seq(10L, 20L, 30L).map(("a", _))
    val b = Seq(10L, 20L, 30L).map(("b", _))
    val out = run(a ++ b)
    assert(out(("a", "b")) === ((3L, 3L, 0L, 0.0, 0.0)))
  }

  test("pure +7 location shift: W1 exactly 7, mean_shift exactly 7 " +
      "(KS would read 1.0 for ANY shift size — the separation this " +
      "operator exists for)") {
    val a = Seq(10L, 20L, 30L, 40L).map(("a", _))
    val b = Seq(17L, 27L, 37L, 47L).map(("b", _))
    val out = run(a ++ b)
    val (na, nb, scaled, emd, shift) = out(("a", "b"))
    assert(na === 4L && nb === 4L)
    assert(emd === 7.0 && shift === 7.0)
    assert(scaled === 7L * 16L)
  }

  test("asymmetric plant: signed area == exact mean difference") {
    // a = {0, 0, 12}; b = {4}: E[a] = 4, E[b] = 4 — means equal but
    // mass moved: W1 > 0 while mean_shift is exactly 0
    val out = run(Seq(("a", 0L), ("a", 0L), ("a", 12L), ("b", 4L)))
    val (_, _, _, emd, shift) = out(("a", "b"))
    assert(shift === 0.0, "equal means")
    assert(emd > 0.0, "but the mass moved")
    // driver check: W1 = ∫|F_a - F_b| = [0,4): |2/3-0|*4 = 8/3;
    // [4,12): |2/3-1|*8 = 8/3 → total 16/3
    assert(math.abs(emd - 16.0 / 3.0) < 1e-12)
  }

  test("q232 at sf0.001 ≡ driver replay of the stepped area") {
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = rows.groupBy(_._1).map { case (s0, v) =>
      s0 -> v.map(_._2).sorted
    }
    val srcs = bySrc.keys.toSeq.sorted
    val got = EmdDrift.q232.build(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getDouble(6)))).toMap
    for (a <- srcs; b <- srcs if a < b) {
      val (va, vb) = (bySrc(a), bySrc(b))
      val (na, nb) = (va.length.toLong, vb.length.toLong)
      val values = (va ++ vb).distinct.sorted
      var (emdScaled, signedScaled) = (0L, 0L)
      values.zip(values.drop(1)).foreach { case (v, nxt) =>
        val gap = va.count(_ <= v) * nb - vb.count(_ <= v) * na
        emdScaled += math.abs(gap) * (nxt - v)
        signedScaled += gap * (nxt - v)
      }
      assert(got((a, b))._1 === emdScaled, s"$a/$b")
      assert(got((a, b))._2 ===
        signedScaled.toDouble / (na.toDouble * nb.toDouble), s"$a/$b")
    }
  }
}
