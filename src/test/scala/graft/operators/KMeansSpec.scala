package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Oracles for [[KMeans]] (X65, q114) beyond the DuckDB replay:
  * argmin-vs-brute-Scala equivalence, partitioning invariance (the
  * integer-exactness claim), monotone Lloyd cost, and a hand-checked
  * tiny fixture.
  */
class KMeansSpec extends SparkSpec {

  private val dim = 64

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  /** Independent plain-Scala replay of the whole fit. */
  private def naiveFit(vs: Seq[(Long, Seq[Double])], k: Int,
      iters: Int): Map[Long, (Int, Long)] = {
    // Spark's Round(double) is BigDecimal HALF_UP, not math.round
    // (they differ on negative representable-.5 ties)
    val q = vs.map { case (id, v) =>
      id -> v.map(x => BigDecimal(x * KMeans.QScale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong + KMeans.Shift).toArray
    }.sortBy(_._1)
    var c: Array[Array[Long]] =
      q.take(k).map(_._2.map(_ * KMeans.CScale)).toArray
    def assignAll(): Map[Long, (Int, Long)] = q.map { case (id, x) =>
      val ds = c.map(cc =>
        x.indices.map(j => {
          val d = x(j) * KMeans.CScale - cc(j); d * d
        }).sum)
      val best = ds.indices.minBy(i => (ds(i), i))
      id -> (best, ds(best))
    }.toMap
    for (_ <- 0 until iters) {
      val a = assignAll()
      val groups = q.groupBy { case (id, _) => a(id)._1 }
      require(groups.size == k)
      c = (0 until k).map { cid =>
        val members = groups(cid).map(_._2)
        Array.tabulate(dim) { j =>
          KMeans.CScale * members.map(_(j)).sum / members.length
        }
      }.toArray
    }
    assignAll()
  }

  test("fit matches an independent plain-Scala replay on real vectors") {
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val expected = naiveFit(rows.toSeq, k = 4, iters = 2)
    val got = KMeans.fit(emb, k = 4, iters = 2, dim = dim).collect()
    assert(got.length === rows.length)
    got.foreach { r =>
      val (cid, d2) = expected(r.getLong(0))
      assert(r.getInt(1) === cid, s"cluster mismatch for vec ${r.getLong(0)}")
      assert(r.getLong(2) === d2, s"d2 mismatch for vec ${r.getLong(0)}")
    }
  }

  test("result is invariant under repartitioning and row order") {
    val base = KMeans.fit(emb, k = 4, iters = 2, dim = dim).collect().toSeq
    val shuffled = KMeans.fit(
      emb.repartition(7, col("vec_id")).sortWithinPartitions(desc("vec_id")),
      k = 4, iters = 2, dim = dim).collect().toSeq
    assert(base === shuffled)
  }

  test("Lloyd cost is monotonically non-increasing across iterations") {
    val costs = (0 to 3).map { it =>
      KMeans.fit(emb, k = 4, iters = it, dim = dim)
        .agg(sum(col("d2"))).first().getLong(0)
    }
    costs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"cost rose across an update: $costs")
    }
  }

  test("hand-checked fixture: two obvious clusters, exact centroids") {
    import spark.implicits._
    // dim-64 vectors: four near 0.1, two near 0.4 — k=2 must split them
    val vecs = Seq(
      1L -> 0.1000, 2L -> 0.1002, 3L -> 0.1004, 4L -> 0.1006,
      5L -> 0.4000, 6L -> 0.4002)
    val df = vecs.map { case (id, v) =>
      (id, Array.fill(dim)(v.toFloat))
    }.toDF("vec_id", "embedding")
    val out = KMeans.fit(df, k = 2, iters = 2, dim = dim).collect()
    val byId = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(byId(1L), byId(2L), byId(3L), byId(4L)).size === 1)
    assert(Set(byId(5L), byId(6L)).size === 1)
    assert(byId(1L) !== byId(5L))
    // cluster of {5,6}: q = 4000+8192 / 4002+8192; centroid
    // = floor(100*(12192+12194)/2) = 1219300 exactly; d2 for id 5 =
    // 64 * (1219200 - 1219300)^2 = 64 * 10000 = 640000
    val d5 = out.find(_.getLong(0) == 5L).get.getLong(2)
    assert(d5 === 640000L)
  }

  test("empty cluster fails loudly") {
    import spark.implicits._
    // 5 identical vectors: every one lands in cluster 0 after init,
    // clusters 1..3 go empty on the first update
    val df = (1L to 5L).map(id => (id, Array.fill(dim)(0.25f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      KMeans.fit(df, k = 4, iters = 1, dim = dim).collect()
    }
    assert(e.getMessage.contains("empty cluster"))
  }

  test("refineCentroids: lenient mode survives empty cells and reduces cost") {
    import spark.implicits._
    val df = (1L to 6L).map { id =>
      (id, Array.fill(dim)(if (id <= 4) 0.1f else 0.4f))
    }.toDF("vec_id", "embedding")
    // a far-off third init centroid empties immediately — lenient mode
    // must keep it stale instead of throwing like fit() above
    val init = Array(Array.fill(dim)(0.0d), Array.fill(dim)(0.5d),
      Array.fill(dim)(9.0d))
    val out = KMeans.refineCentroids(df, init, iters = 2)
    assert(out.length === 3 && out.forall(_.length === dim))
    // refined cells land on the two data modes (quantization-exact to
    // 1e-4); the empty third centroid is unchanged
    assert(math.abs(out(0)(0) - 0.1d) < 1e-3)
    assert(math.abs(out(1)(0) - 0.4d) < 1e-3)
    assert(math.abs(out(2)(0) - 9.0d) < 1e-3)
  }

  test("refineCentroids is invariant under repartitioning (distributed IVF path)") {
    val c1 = KMeans.refineCentroids(emb.repartition(13), initFromRows, 3)
    val c2 = KMeans.refineCentroids(emb.repartition(2,
      col("vec_id") % 7), initFromRows, 3)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
  }

  /** Deterministic unit-space init for the invariance test: the 8
    * smallest-id embeddings.
    */
  private lazy val initFromRows: Array[Array[Double]] =
    emb.orderBy(col("vec_id")).limit(8).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

  test("trainCentroids with a binding sample cap runs the distributed refine deterministically") {
    val vecs = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    // corpus is 500 > cap 256 → the refine gate opens
    val m1 = AnnIvf.trainCentroids(vecs, nlist = 16, dim = dim,
      iterations = 2, sampleCap = 256)
    val m2 = AnnIvf.trainCentroids(vecs.repartition(11), nlist = 16,
      dim = dim, iterations = 2, sampleCap = 256)
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq,
      "cap-bound trainer must be partition-invariant end to end")
    assert(m1.length === 16)
    // the refined model must still be a usable quantizer: all cells
    // distinct (no degenerate duplicate centroids)
    assert(m1.map(_.toSeq).distinct.length === 16)
  }
}
