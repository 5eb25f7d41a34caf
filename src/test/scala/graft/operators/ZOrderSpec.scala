package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ZOrderClustering]] (X109) structural oracles (q156's key values
  * are the DuckDB hash check): the z-ordered layout must give every
  * file a compact RECTANGLE of the clustered key space — so a
  * predicate on the SECOND column alone prunes files, which the
  * single-column sorted layout cannot do — while preserving the data
  * exactly. Clustered on (l_partkey, l_orderkey): both high-cardinality
  * (suppkey has 10 distinct values at this SF — too coarse to carve
  * rectangles from).
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_suppkey"))

  /** Per-file [min,max] of both clustered keys for a written layout. */
  private def fileRects(dir: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min(col("l_partkey")).as("plo"), max(col("l_partkey")).as("phi"),
        min(col("l_orderkey")).as("olo"), max(col("l_orderkey")).as("ohi"))
      .select(col("plo"), col("phi"), col("olo"), col("ohi"))
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("z-ordered files cover compact rectangles: an orderkey-only band " +
      "prunes most z-files and NO partkey-sorted files; data preserved") {
    val zDir = tmpDir("zorder") + "/li"
    val sDir = tmpDir("zsort") + "/li"
    ZOrderClustering.writeZOrdered(li, zDir, "l_partkey", "l_orderkey", 16)
    graft.sources.Warehouse.writeSortedByRange(li, sDir, "l_partkey", 16)

    // data preserved exactly ((orderkey, linenumber) is NOT unique in
    // the synthetic data — total order needs all four columns)
    val key = Seq("l_orderkey", "l_linenumber", "l_partkey",
      "l_suppkey").map(col)
    assert(spark.read.parquet(zDir).orderBy(key: _*).collect().toSeq ===
      li.orderBy(key: _*).collect().toSeq)

    val zRects = fileRects(zDir)
    val sRects = fileRects(sDir)
    assert(zRects.size >= 8 && sRects.size >= 8, "enough files to prune")

    // a band on the SECOND column: ~8% of the orderkey range, placed
    // INSIDE the dyadic cell [0.25, 0.375) — a band straddling the
    // top-bit boundary at 0.5 touches every half and is the curve's
    // worst case (measured 11/16 hits), which is a property of z-order
    // itself, not of this implementation
    val (oLo, oHi) = (li.agg(min(col("l_orderkey"))).first().getLong(0),
      li.agg(max(col("l_orderkey"))).first().getLong(0))
    val span = oHi - oLo
    val (bandLo, bandHi) = (oLo + span * 27 / 100, oLo + span * 35 / 100)
    def hits(rects: Seq[(Long, Long, Long, Long)]): Int =
      rects.count { case (_, _, lo, hi) => hi >= bandLo && lo <= bandHi }
    val zHits = hits(zRects); val sHits = hits(sRects)
    assert(sHits === sRects.size,
      "partkey-sorted files all span the orderkey range — zero pruning")
    assert(zHits * 2 <= zRects.size,
      s"z-order must prune at least half the files: $zHits/${zRects.size}")

    // and the average per-file orderkey span shrinks vs the sorted layout
    def avgSpan(rects: Seq[(Long, Long, Long, Long)]): Double =
      rects.map { case (_, _, lo, hi) => (hi - lo).toDouble / span }
        .sum / rects.size
    assert(avgSpan(zRects) < 0.6 * avgSpan(sRects),
      s"z spans ${avgSpan(zRects)} vs sort ${avgSpan(sRects)}")
  }

  test("the z key interleave round-trips: de-interleaving odd/even bits " +
      "recovers the bucket ranks exactly") {
    val sample = ZOrderClustering.q156.build(spark, sf0001).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val (za, zb, z) = (r.getLong(4), r.getLong(5), r.getLong(6))
      var (da, db) = (0L, 0L)
      (0 until ZOrderClustering.Bits).foreach { i =>
        da |= ((z >> (2 * i + 1)) & 1L) << i
        db |= ((z >> (2 * i)) & 1L) << i
      }
      assert(da === za && db === zb, s"z=$z decoded ($da,$db) != ($za,$zb)")
    }
  }
}
