package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[AspectDrift]] (X211) oracles: the fixture invariant its bucket
  * axis rides on (dense doc_ids), and q244 at sf0.001 ≡ a driver
  * fold: bucketed negative counts from the scorer output pushed
  * through the SAME Mann–Kendall arithmetic as MannKendallSpec's.
  */
class AspectDriftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("fixture invariant: doc_ids are dense 0..N-1 (the bucket " +
      "axis assumes it; a regen that broke it fails HERE)") {
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(ids.head === 0L && ids.last === ids.length - 1L,
      "doc_id gap would make ingest buckets unequal")
  }

  test("q244 at sf0.001 == driver fold of MK over bucketed negative " +
      "counts") {
    import graft.functions.MockScorers.aspects
    val scored = PipelineQueries.scores(spark, sf0001).collect()
    val nFull = scored.length / AspectDrift.BucketDocs
    val got = AspectDrift.q244.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ai = aspects.indexOf(r.getString(0))
      val colName = aspects(ai).toLowerCase + "_pred"
      val series = scored
        .map(x => (x.getAs[Long]("doc_id") / AspectDrift.BucketDocs,
          x.getAs[Int](colName)))
        .filter(_._1 < nFull)
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, xs) => xs.count(_._2 == 1).toLong }
      // the same fold as MannKendallSpec.expected
      val n = series.length
      val sStat = (for { i <- series.indices; j <- i + 1 until n }
        yield math.signum(series(j).compare(series(i))).toLong).sum
      val tie = series.groupBy(identity).values
        .map(g => g.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = n.toLong * (n - 1) * (2 * n + 5) - tie
      assert(r.getLong(1) === n.toLong && r.getLong(2) === sStat &&
        r.getLong(3) === var18, s"aspect ${r.getString(0)}")
      if (var18 > 0) {
        val z =
          if (sStat > 0) (sStat - 1.0) / math.sqrt(var18 / 18.0)
          else if (sStat < 0) (sStat + 1.0) / math.sqrt(var18 / 18.0)
          else 0.0
        assert(r.getDouble(4) === z &&
          r.getBoolean(5) === (math.abs(z) > MannKendall.Z975))
      } else assert(r.isNullAt(4) && r.isNullAt(5))
    }
  }
}
