package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MmrDiversify]] (X85) semantic oracles: planted redundancy — the
  * two most relevant candidates are near-identical, so plain top-k
  * keeps both while MMR's second pick skips to the diverse candidate;
  * the greedy scores match an independent driver replay; the pick set
  * is partitioning-independent.
  */
class MmrDiversifySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def vec(spec: (Int, Double)*): Array[Float] = {
    val v = new Array[Float](dim)
    spec.foreach { case (i, x) => v(i) = x.toFloat }
    v
  }

  private def dir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val d = tmpDir("mmr-emb")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("planted redundancy: MMR pick 2 skips the near-duplicate of " +
      "pick 1 that plain top-k would keep") {
    // query mixes axes 0+1, so axis-0-aligned and axis-1-aligned
    // candidates are EQUALLY relevant but mutually diverse — the
    // geometry where λ=0.7's redundancy penalty (≤0.3) can actually
    // flip the order: candidates 1,2 near-identical (sim≈1, rel .774/
    // .768), candidate 3 axis-1-aligned (rel .742, sim-to-1 ≈ .15).
    // Plain top-2 keeps {1,2}; MMR's pick 2 must jump to 3.
    val rows = Seq(
      (0L, vec(0 -> 1.0, 1 -> 1.0), 0),
      (1L, vec(0 -> 1.0, 1 -> 0.1), 0),
      (2L, vec(0 -> 1.0, 1 -> 0.09), 0),
      (3L, vec(1 -> 1.0, 0 -> 0.05), 0),
      (4L, vec(2 -> 1.0, 0 -> 0.3, 1 -> 0.3), 0),
      (5L, vec(4 -> 1.0), 0))
    val got = MmrDiversify.diversified(
      spark.read.parquet(s"${dir(rows)}/embeddings.parquet"), 0L)
      .collect().map(r => r.getAs[Int]("sel_rank") -> r.getAs[Long]("vec_id"))
      .toMap
    assert(got(1) === 1L, s"pick 1 = most relevant: $got")
    assert(got(2) === 3L,
      s"pick 2 must skip the near-dup candidate 2 for the diverse 3: $got")
    // with 1 and 3 both held, candidate 2's redundancy (≈1 vs pick 1)
    // still prices it above the weakly-relevant diverse 4 — greedy MMR
    // is not pure novelty search
    assert(got(3) === 2L, s"pick 3: $got")
    assert(got(4) === 4L, s"pick 4: $got")
  }

  test("greedy scores match an independent driver replay on sf0.001") {
    val all = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = all(0L)
    val shortlist = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v), v) }
      .sortBy { case (id, rel, _) => (-rel, id) }
      .take(MmrDiversify.Shortlist)
    var selected = List(shortlist.head)
    var scores = List(shortlist.head._2)
    (2 to MmrDiversify.K).foreach { _ =>
      val rem = shortlist.filterNot(c => selected.exists(_._1 == c._1))
      val pick = rem.map { case (id, rel, v) =>
        val red = selected.map(s => cos(v, s._3)).max
        (id, MmrDiversify.Lambda * rel + (MmrDiversify.Lambda - 1.0) * red,
          rel, v)
      }.sortBy { case (id, mmr, _, _) => (-mmr, id) }.head
      selected = selected :+ ((pick._1, pick._3, pick._4))
      scores = scores :+ pick._2
    }
    val got = MmrDiversify.q136.build(spark, sf0001).collect()
    assert(got.length === MmrDiversify.K)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("vec_id") === selected(i)._1,
        s"pick ${i + 1} diverges from the greedy replay")
      assert(math.abs(r.getAs[Double]("mmr_r") - scores(i)) < 1e-5)
    }
  }
}
