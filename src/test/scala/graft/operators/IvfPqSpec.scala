package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[IvfPq]] (X80, IVFADC) oracles — the composed IVF∘PQ index checked
  * stage by stage: (1) the residual encode round-trips (cell is the
  * true nearest coarse centroid, codes are valid nibbles over the
  * RESIDUAL codebooks), (2) the per-(query, cell) residual-ADC distance
  * equals an independent driver recomputation from raw vectors, (3)
  * recall@5 vs exact brute force clears 0.8, and (4) the plan contains
  * no CartesianProduct (the probe/candidate joins are keyed).
  */
class IvfPqSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val vecs = emb.select(col("vec_id"),
    col("embedding").cast("array<double>").as("emb"))
  private val Dim = 64
  // both trainers are deterministic → this is the same index topK builds
  private lazy val idx = IvfPq.buildIndex(vecs, Dim)
  private lazy val byId: Map[Long, Array[Double]] = vecs.collect()
    .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def nearestCell(v: Array[Double]): Int =
    idx.coarse.indices.minBy { c =>
      var d = 0d; var i = 0
      while (i < Dim) {
        val diff = v(i) - idx.coarse(c)(i); d += diff * diff; i += 1
      }
      (d, c)
    }

  test("residual encode round-trip: cell is the nearest coarse " +
      "centroid and codes decode to valid residual-codebook ids") {
    val rows = idx.codes.collect()
    assert(rows.length === byId.size)
    rows.foreach { r =>
      val id = r.getLong(0); val cell = r.getInt(1); val code = r.getLong(2)
      assert(cell === nearestCell(byId(id)), s"cell mismatch for vec $id")
      assert(code >= 0L && code < (1L << 32), s"code $code outside 32 bits")
      (0 until PqAnn.M).foreach { j =>
        assert(((code >> (4 * j)) & 15L) < PqAnn.Ks)
      }
    }
  }

  test("residual ADC distance equals independent driver recomputation " +
      "(assign the vector's residual per subspace, sum exact " +
      "sub-distances to the query's residual)") {
    val queries = Seq(0L, 1L, 2L)
    val cand = IvfPq.adcCandidates(idx, vecs, queries,
      nprobe = AnnIvf.autoNprobe(idx.coarse.length), shortlist = 8).collect()
    assert(cand.nonEmpty)
    cand.foreach { r =>
      val qid = r.getLong(0); val vid = r.getLong(1)
      val cell = r.getInt(2); val got = r.getDouble(3)
      // v's residual against ITS OWN cell (the stored code), scored
      // against q's residual against the PROBED cell — for a scored row
      // the two are the same cell by construction of the cell equi-join
      assert(cell === nearestCell(byId(vid)),
        s"candidate ($qid,$vid) scored in a foreign cell")
      val vres = Array.tabulate(Dim)(i =>
        byId(vid)(i) - idx.coarse(cell)(i))
      val qres = Array.tabulate(Dim)(i =>
        byId(qid)(i) - idx.coarse(cell)(i))
      var expect = 0d
      (0 until PqAnn.M).foreach { j =>
        val sub = vres.slice(j * PqAnn.SubDim, (j + 1) * PqAnn.SubDim)
        val cb = idx.model(j)
        val best = cb.indices.minBy { c =>
          var d = 0d; var i = 0
          while (i < PqAnn.SubDim) {
            val diff = sub(i) - cb(c)(i); d += diff * diff; i += 1
          }
          (d, c)
        }
        var d = 0d; var i = 0
        while (i < PqAnn.SubDim) {
          val diff = qres(j * PqAnn.SubDim + i) - cb(best)(i)
          d += diff * diff; i += 1
        }
        expect += d
      }
      assert(math.abs(got - expect) < 1e-9,
        s"residual-ADC mismatch for ($qid, $vid): $got vs $expect")
    }
  }

  test("recall@5 vs exact brute force clears 0.8") {
    val queries = 0L to 9L
    val got = IvfPq.topK(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hit = queries.map { qid =>
      val q = byId(qid)
      val brute = byId.toSeq.filter(_._1 != qid).sortBy { case (id, v) =>
        var d = 0d; var i = 0
        while (i < Dim) { val diff = q(i) - v(i); d += diff * diff; i += 1 }
        (d, id)
      }.take(5).map(_._1).toSet
      (got.getOrElse(qid, Set.empty) intersect brute).size
    }.sum
    val recall = hit.toDouble / (queries.size * 5)
    assert(recall >= 0.8, s"ivfpq recall@5 $recall below 0.8")
  }

  test("plan gate: no CartesianProduct anywhere in the topK plan") {
    val plan = IvfPq.topK(emb, 0L to 4L, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in IVFADC plan")
  }
}
