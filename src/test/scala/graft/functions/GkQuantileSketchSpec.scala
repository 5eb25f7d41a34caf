package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.expressions.GkQuantileSketch
import graft.operators.StreamingProfile

/** X113 oracles — the GK sketch as a mergeable column. The honest
  * contract (r12 HLL lesson): sliced-merge and one-shot sketches may
  * structurally differ, so the oracle is the ε·n RANK-ERROR GUARANTEE
  * checked against exact ranks, not state equality — PLUS determinism
  * (GK has no randomness, so the same build replayed is
  * byte-identical), exact count propagation, the mergeOnceAs
  * replay/exactly-once inheritance, and the unknown-bounds equi-depth
  * read path on the real corpus.
  */
class GkQuantileSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val eps = 1e-3

  /** Exact rank of `v` (count ≤ v) in `vals`. */
  private def rankOf(vals: Array[Double], v: Double): Long =
    vals.count(_ <= v).toLong

  private def checkBoundaries(vals: Array[Double], bounds: Seq[Double],
      k: Int, tolN: Double): Unit = {
    val n = vals.length.toLong
    bounds.zipWithIndex.foreach { case (b, i) =>
      val target = (i + 1).toLong * n / k
      val err = math.abs(rankOf(vals, b) - target)
      assert(err <= tolN,
        s"boundary ${i + 1}/$k = $b: rank ${rankOf(vals, b)} vs target " +
          s"$target (err $err > $tolN)")
    }
  }

  test("sketch boundaries on the real corpus hit exact target ranks " +
      "within eps*n, one-shot AND merged over adversarial slicings") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_extendedprice").cast("double").as("v"))
    val vals = li.collect().map(_.getDouble(0))
    val n = vals.length
    val k = 10
    val tol = math.max(1.0, 2 * eps * n) // merge can double the eps term
    // one-shot
    val one = li.agg(GkQuantileSketch.sketchAgg(col("v"), eps).as("gk"))
      .head.getAs[Array[Byte]](0)
    assert(GkQuantileSketch.rowCount(one) === n.toLong)
    checkBoundaries(vals,
      GkQuantileSketch.query(one, (1 until k).map(_.toDouble / k)).toSeq,
      k, tol)
    // sliced: 5 value-range slices built independently, merged via the
    // stored-binary path (gk_merge_agg) — the cross-shard union shape
    val slices = (0 until 5).map(s =>
      li.filter(pmod(col("v").cast("long"), lit(5)) === s)
        .agg(GkQuantileSketch.sketchAgg(col("v"), eps).as("gk")))
    val merged = slices.reduce(_ unionByName _)
      .agg(GkQuantileSketch.mergeAgg(col("gk")).as("gk"))
      .head.getAs[Array[Byte]](0)
    assert(GkQuantileSketch.rowCount(merged) === n.toLong)
    checkBoundaries(vals,
      GkQuantileSketch.query(merged, (1 until k).map(_.toDouble / k)).toSeq,
      k, tol)
  }

  test("determinism: the same build replayed is byte-identical (GK has " +
      "no randomness — unlike HLL, a sketch diff means a code change)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_extendedprice").cast("double").as("v"))
    def build(): Array[Byte] =
      li.coalesce(1) // one partition pins insertion order
        .agg(GkQuantileSketch.sketchAgg(col("v"), eps).as("gk"))
        .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(), build()))
  }

  test("serialize/deserialize round-trips the summary exactly") {
    val qs = (1 to 1000).foldLeft(GkQuantileSketch.empty(eps)) {
      (s, i) => s.insert(i.toDouble)
    }.compress()
    val rt = GkQuantileSketch.deserialize(GkQuantileSketch.serialize(qs))
    assert(rt.count === qs.count)
    assert(rt.relativeError === qs.relativeError)
    assert(rt.sampled.map(s => (s.value, s.g, s.delta)).toSeq ===
      qs.sampled.map(s => (s.value, s.g, s.delta)).toSeq)
  }

  test("X100 unknown-bounds path: mergeSketchOnce slices -> equi-depth " +
      "boundaries within the bound; replayed batch id is a no-op") {
    val rows = (0 until 10000).map(i => ((i * 37) % 10000).toDouble)
    val path = tmpDir("gk-state") + "/state"
    val slices = Seq(rows.take(3000), rows.slice(3000, 7000), rows.drop(7000))
    slices.zipWithIndex.foreach { case (s, b) =>
      StreamingProfile.mergeSketchOnce(s.toDF("x"), "x", path, b.toLong,
        eps)
    }
    val k = 10
    val bounds = StreamingProfile.equiDepthSketch(spark, path, k)
    assert(bounds.size === k - 1)
    // values are a permutation of 0..9999 → boundary i ≈ 1000·i
    bounds.zipWithIndex.foreach { case (b, i) =>
      assert(math.abs(b - 1000.0 * (i + 1)) <= 2 * eps * 10000 + 1,
        s"boundary ${i + 1} = $b far from ${1000 * (i + 1)}")
    }
    val before = StreamingProfile.equiDepthSketch(spark, path, k)
    StreamingProfile.mergeSketchOnce(rows.toDF("x"), "x", path, 2L, eps)
    assert(StreamingProfile.equiDepthSketch(spark, path, k) === before,
      "replayed batch must not change the state")
  }
}
