package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PqAnn]] (X76) oracles: code packing round-trips, the ADC distance
  * equals the sum of exact subspace distances to the ASSIGNED codebook
  * entries (the PQ approximation, computed two independent ways), and
  * recall@5 against the exact brute-force baseline clears the bar a
  * 64×-compressed code can honestly clear.
  */
class PqAnnSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("codes are 32-bit-packable and decode to valid codebook ids") {
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val model = PqAnn.train(vecs)
    val codes = vecs.select(col("vec_id"),
      PqAnn.encode(col("emb"), model).as("code")).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val c = r.getLong(1)
      assert(c >= 0L && c < (1L << 32), s"code $c outside 32 bits")
      (0 until PqAnn.M).foreach { j =>
        val nib = (c >> (4 * j)) & 15L
        assert(nib < PqAnn.Ks)
      }
    }
  }

  test("ADC distance equals the exact sum of assigned-sub-centroid " +
      "distances, recomputed independently on the driver") {
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val model = PqAnn.train(vecs)
    val got = PqAnn.adcTopK(emb, Seq(0L, 1L), k = 3).collect()
    assert(got.length === 6)
    val byId = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    got.foreach { r =>
      val q = byId(r.getLong(0)); val v = byId(r.getLong(1))
      // re-derive: assign v's subvectors to codebooks, sum exact dists
      var expect = 0d
      (0 until PqAnn.M).foreach { j =>
        val sub = v.slice(j * PqAnn.SubDim, (j + 1) * PqAnn.SubDim)
        val cb = model(j)
        val best = cb.indices.minBy { c =>
          var d = 0d; var i = 0
          while (i < PqAnn.SubDim) {
            val diff = sub(i) - cb(c)(i); d += diff * diff; i += 1
          }
          (d, c)
        }
        var d = 0d; var i = 0
        while (i < PqAnn.SubDim) {
          val diff = q(j * PqAnn.SubDim + i) - cb(best)(i)
          d += diff * diff; i += 1
        }
        expect += d
      }
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"ADC mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("recall@5 vs exact brute force clears 0.8 with the ADC " +
      "shortlist + exact re-rank two-stage") {
    val queries = 0L to 9L
    val pq = PqAnn.topK(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // exact L2 top-5 per query on the driver (300 vectors at sf0.001)
    val all = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val hit = queries.map { qid =>
      val q = all(qid)
      val brute = all.toSeq.filter(_._1 != qid).sortBy { case (id, v) =>
        var d = 0d; var i = 0
        while (i < v.length) { val diff = q(i) - v(i); d += diff * diff; i += 1 }
        (d, id)
      }.take(5).map(_._1).toSet
      (pq.getOrElse(qid, Set.empty) intersect brute).size
    }.sum
    val recall = hit.toDouble / (queries.size * 5)
    assert(recall >= 0.8, s"pq recall@5 $recall below 0.8")
  }
}
