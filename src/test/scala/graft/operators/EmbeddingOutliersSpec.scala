package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[EmbeddingOutliers]] (X79) semantic oracles: a planted far vector
  * is flagged first, exactly n div 20 vectors are flagged per label,
  * and the flag set is partitioning-independent (integer-grid claim).
  */
class EmbeddingOutliersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = tmpDir("outlier-emb")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("a planted far vector is the top-ranked outlier; the cut is " +
      "exactly n div 20 per label") {
    val dim = 64
    // 39 tight vectors near 0.5, one at -0.9: n=40 → 2 outliers
    val tight = (1L to 39L).map(i =>
      (i, Array.fill(dim)(0.5f + (i % 7) * 0.001f), 0))
    val far = Seq((40L, Array.fill(dim)(-0.9f), 0))
    val dir = embDir(tight ++ far)
    val rows = EmbeddingOutliers.q130.build(spark, dir).collect()
    assert(rows.length === 40)
    val flagged = rows.filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged.length === 2) // 40 div 20
    val top = rows.find(_.getAs[Int]("dist_rank") == 1).get
    assert(top.getAs[Long]("vec_id") === 40L)
    assert(top.getAs[Boolean]("is_outlier"))
  }

  test("negative-sum centroids use floor division (d2 matches a " +
      "driver recomputation with Math.floorDiv)") {
    val dim = 64
    // all components ≈ -0.9 → q ≈ -808 < 0, so Σq is negative and the
    // truncate-vs-floor divergence the r10 ADVICE flagged is live; the
    // i%3 jitter makes Σq indivisible by n at most positions
    val rows = (1L to 7L).map(i =>
      (i, Array.fill(dim)(-0.9f - (i % 3) * 0.0001f), 0))
    val dir = embDir(rows)
    val got = EmbeddingOutliers.q130.build(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // driver replay of the integer recipe with explicit floorDiv
    val q = rows.map { case (id, v, _) =>
      id -> v.map(x => math.round(x.toDouble * 10000.0) + 8192L)
    }.toMap
    val cent = Array.tabulate(dim) { p =>
      val s = q.valuesIterator.map(_(p)).sum
      Math.floorDiv(s, q.size.toLong)
    }
    q.foreach { case (id, qs) =>
      val d2 = (0 until dim).map { p =>
        val d = qs(p) - cent(p); d * d
      }.sum
      assert(got(id) === d2, s"d2 mismatch for vec $id")
    }
  }

  test("flag set is independent of input partitioning on sf0.001") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val d1 = tmpDir("out-p1"); val d8 = tmpDir("out-p8")
    emb.repartition(1).write.parquet(s"$d1/embeddings.parquet")
    emb.repartition(8).write.parquet(s"$d8/embeddings.parquet")
    val a = EmbeddingOutliers.q130.build(spark, d1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
    val b = EmbeddingOutliers.q130.build(spark, d8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
    assert(a.toSeq === b.toSeq)
  }
}
