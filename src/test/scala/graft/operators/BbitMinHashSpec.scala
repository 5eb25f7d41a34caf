package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[BbitMinHash]] (X67) oracles: packing round-trip against the full
  * signatures, identical-doc saturation, estimator accuracy against
  * EXACT Jaccard on the real corpus, and the Li–König bias correction
  * actually mattering (raw lane fraction overestimates, the corrected
  * one doesn't).
  */
class BbitMinHashSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("pack keeps exactly the low 2 bits of every lane") {
    val sigs = MinHashDedup.signatures(MinHashDedup.shingles(docs.limit(50)))
    val packed = BbitMinHash.pack(sigs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sigs.collect().foreach { r =>
      val id = r.getLong(0)
      val expect = (0 until 32).map { i =>
        (r.getLong(i + 1) & 3L) << (2 * i)
      }.reduce(_ | _)
      assert(packed(id) === expect, s"doc $id pack mismatch")
    }
  }

  test("identical docs: 32/32 lanes match, estimate saturates at 1") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val out = BbitMinHash.nearDuplicates(d, 0.9).collect()
    assert(out.length === 1)
    assert(out.head.getInt(2) === 32)
    assert(out.head.getDouble(3) === 1.0)
  }

  test("estimator tracks exact jaccard on real candidate pairs (bias-corrected)") {
    val sh = MinHashDedup.shingles(docs)
    val exact = DedupQueries.bruteJaccardPairs(sh, 0.05).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val est = BbitMinHash.nearDuplicates(docs, -1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getDouble(3)))
    val joined = est.flatMap { case (k, (_, je)) =>
      exact.get(k).map(j => (j, je))
    }
    assert(joined.nonEmpty, "no overlapping pairs to score")
    val mae = joined.map { case (j, je) => math.abs(j - je) }.sum / joined.size
    info(f"pairs=${joined.size}, MAE(Ĵ vs J)=$mae%.4f")
    // 32 two-bit lanes: sd ≈ sqrt(C(1-C)/32)/(1-1/4) ≤ ~0.12; the MAE
    // over many pairs should sit well inside one sd
    assert(mae < 0.12, f"estimator MAE too high: $mae%.4f")
    // bias direction (SIGNED, not MAE — the correction trades a
    // systematic overshoot for zero-mean variance, so on high-J LSH
    // candidates the absolute errors can tie): the raw lane fraction
    // overshoots J by (1−J)/4 in expectation; the corrected estimator
    // is unbiased, so its signed mean must sit near zero while raw's
    // must be clearly positive
    val rawBias = est.flatMap { case (k, (lanes, _)) =>
      exact.get(k).map(j => lanes / 32.0 - j)
    }
    val corrBias = joined.map { case (j, je) => je - j }
    val (rawMean, corrMean) =
      (rawBias.sum / rawBias.size, corrBias.sum / corrBias.size)
    info(f"signed bias: raw=$rawMean%.4f corrected=$corrMean%.4f")
    assert(rawMean > 0.005, f"raw lane fraction should overestimate")
    assert(math.abs(corrMean) < rawMean,
      "corrected estimator must remove the systematic overshoot")
  }

  test("packed index is one long per doc (the 32x claim is structural)") {
    val sigs = MinHashDedup.signatures(MinHashDedup.shingles(docs.limit(10)))
    val packed = BbitMinHash.pack(sigs)
    assert(packed.schema.fields.map(_.name).toSeq === Seq("doc_id", "bsig"))
    assert(packed.schema("bsig").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(sigs.schema.fields.length === 33) // doc_id + 32 sig columns
  }
}
