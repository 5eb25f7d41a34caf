package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SemanticDedup]] oracle on a constructed 2-D corpus where every
  * angle (and therefore every cell, cosine, and centroid distance) is
  * chosen by hand: centroids (1,0) and (0,1), so the cell boundary sits
  * at 45°, and minCos = 0.9 admits pairs up to ~25.8° apart.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkSpec {

  private val centroids = Array(1.0, 0.0, 0.0, 1.0) // c0=(1,0), c1=(0,1)

  private def vecAt(deg: Double, scale: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r) * scale, math.sin(r) * scale)
  }

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, vecAt(0, 1.0)),   // cell 0 — group member
      (2L, vecAt(6, 1.0)),   // cell 0 — group member
      (3L, vecAt(12, 1.0)),  // cell 0 — farthest from centroid → kept
      (4L, vecAt(6, 3.0)),   // scaled copy of id 2 — unit-identical
      (5L, vecAt(-30, 1.0)), // cell 0 but ≥30° from everyone — unpaired
      (6L, vecAt(43, 1.0)),  // cell 0 ┐ cos(43°,47°)=cos 4° ≥ 0.9 but the
      (7L, vecAt(47, 1.0))   // cell 1 ┘ boundary splits them — not mined
    ).toDF("vec_id", "embedding")
  }

  private def pruned = SemanticDedup
    .prune(corpus, centroids, cells = 2, dim = 2, minCos = 0.9)
    .collect()
    .map(r => r.getLong(0) -> r).toMap

  test("within-cell near-duplicates close into one group; others absent") {
    val m = pruned
    assert(m.keySet === Set(1L, 2L, 3L, 4L),
      "only clustered vectors appear: the lone vector and the " +
        "boundary-straddling pair must be absent")
    assert(m.values.map(_.getAs[Long]("group_id")).toSet === Set(1L))
    assert(m.values.map(_.getAs[Long]("group_size")).toSet === Set(4L))
  }

  test("keep rule: farthest-from-centroid member survives") {
    // dist²(unit(θ), (1,0)) = 2 − 2cos θ, monotonic in |θ| — so of
    // {0°, 6°, 6°, 12°} the 12° member (id 3) is the most atypical
    val kept = pruned.collect { case (id, r) if r.getAs[Boolean]("kept") => id }
    assert(kept.toSet === Set(3L))
  }

  test("scale invariance: a rescaled duplicate joins its original's group") {
    // id 4 is id 2 scaled ×3: unit-normalization makes them identical,
    // so it lands in the same cell and pairs at cosine exactly 1
    val m = pruned
    assert(m(4L).getAs[Long]("group_id") === m(2L).getAs[Long]("group_id"))
    assert(m(4L).getAs[Int]("cell") === m(2L).getAs[Int]("cell"))
  }

  test("zero-norm vectors are excluded by contract, not NaN fallthrough") {
    val s = spark
    import s.implicits._
    // a zero vector has no direction: it must vanish from the output
    // (explicit nrm > 0 filter) and must not poison its cellmates —
    // the rest of the corpus clusters exactly as without it
    val withZero = corpus.union(
      Seq((8L, Seq(0.0, 0.0))).toDF("vec_id", "embedding"))
    val m = SemanticDedup
      .prune(withZero, centroids, cells = 2, dim = 2, minCos = 0.9)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!m.contains(8L), "zero vector must not appear in any group")
    assert(m.keySet === Set(1L, 2L, 3L, 4L))
    assert(m.collect { case (id, r) if r.getAs[Boolean]("kept") => id }
      .toSet === Set(3L))
  }

  test("cell-boundary separation is the documented approximation") {
    // ids 6 and 7 are 4° apart (cosine ≈ 0.998, far above minCos) yet
    // assigned to different cells — SemDeDup by design never mines a
    // pair across cells, so neither is clustered. This is the cost of
    // the |cell|²-bounded quadratic face, asserted as INTENDED.
    val cellOf = SemanticDedup
      .prune(corpus, centroids, cells = 2, dim = 2, minCos = -1.0)
      .filter(col("vec_id").isin(6L, 7L))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cell")).toMap
    // with minCos = -1 every same-cell pair clusters, so 6/7 appearing
    // in DIFFERENT groups (or cells) proves the boundary split
    assert(cellOf.getOrElse(6L, -1) !== cellOf.getOrElse(7L, -1))
  }
}
