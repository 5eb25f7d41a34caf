package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PrototypeDiversify]] on a constructed 2-D corpus (the
  * SemanticDedupSpec harness): centroids (1,0) and (0,1), every angle
  * hand-chosen so cells, centroid distances, and therefore prototype
  * ranks are known in advance.
  */
class PrototypeDiversifySpec extends AnyFunSuite with SparkSpec {

  private val centroids = Array(1.0, 0.0, 0.0, 1.0) // c0=(1,0), c1=(0,1)

  private def vecAt(deg: Double, scale: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r) * scale, math.sin(r) * scale)
  }

  private def run(vecs: Seq[(Long, Seq[Double])], dropFrac: Double) = {
    val s = spark
    import s.implicits._
    PrototypeDiversify.diversify(vecs.toDF("vec_id", "embedding"),
      centroids, cells = 2, dim = 2, dropFrac = dropFrac)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cell"), r.getAs[Double]("cdist_r"),
          r.getAs[Long]("cell_size"), r.getAs[Int]("proto_rank"),
          r.getAs[Boolean]("kept"))))
      .toMap
  }

  test("the nearest quarter of each cell is dropped, the boundary kept") {
    // cell 0 (nearer 0°): angles 2..38 — rank order == angle order.
    // 8 vectors, ceil(0.25·8) = 2 dropped: the two smallest angles.
    val cell0 = Seq(2.0, 7.0, 12.0, 17.0, 22.0, 28.0, 33.0, 38.0)
    // cell 1 (nearer 90°): 5 vectors, ceil(0.25·5) = 2 dropped
    val cell1 = Seq(88.0, 80.0, 72.0, 64.0, 56.0)
    val vecs =
      cell0.zipWithIndex.map { case (a, i) => (i + 1L) -> vecAt(a, 2.0) } ++
        cell1.zipWithIndex.map { case (a, i) => (100L + i) -> vecAt(a, 0.5) }
    val got = run(vecs, 0.25)
    assert(got.size === vecs.size)
    // cell 0: ids 1..8 by ascending angle == ascending cdist
    (1L to 8L).foreach { id =>
      val (cell, _, size, rank, kept) = got(id)
      assert(cell === 0 && size === 8L)
      assert(rank === id.toInt, s"rank of id $id")
      assert(kept === (id > 2), s"kept of id $id")
    }
    // cell 1: ids 100..104 at descending distance from 90° — cdist
    // ascends with id 100 (88°) closest, so ranks follow id order
    (100L to 104L).foreach { id =>
      val (cell, _, size, rank, kept) = got(id)
      assert(cell === 1 && size === 5L)
      assert(rank === (id - 99L).toInt, s"rank of id $id")
      assert(kept === (id > 101L), s"kept of id $id")
    }
    // scale-invariance: cell0 at scale 2.0 and cell1 at 0.5 both
    // landed in their angular cells (unit-normalization did its job)
  }

  test("dropFrac 0 keeps everything; dropped always have min cdist") {
    val vecs = Seq(1L -> vecAt(10, 1.0), 2L -> vecAt(30, 1.0),
      3L -> vecAt(44, 1.0), 4L -> vecAt(80, 1.0))
    val all = run(vecs, 0.0)
    assert(all.values.forall(_._5), "dropFrac=0 must keep every vector")
    val half = run(vecs, 0.5)
    val dropped = half.filter(!_._2._5).values
    val kept = half.filter(_._2._5).values
    dropped.foreach { case (cell, cd, _, _, _) =>
      kept.filter(_._1 == cell).foreach { case (_, kd, _, _, _) =>
        assert(cd <= kd, "a dropped prototype farther than a kept one")
      }
    }
  }

  test("zero-norm vectors are excluded, not NaN-ranked") {
    val vecs = Seq(1L -> Seq(0.0, 0.0), 2L -> vecAt(10, 1.0),
      3L -> vecAt(85, 1.0))
    val got = run(vecs, 0.25)
    assert(!got.contains(1L), "zero vector must not appear")
    assert(got.size === 2)
  }
}
