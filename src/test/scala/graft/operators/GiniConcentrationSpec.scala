package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[GiniConcentration]] (X104) oracles on planted source mixes:
  * exactly 0 for a perfectly even mix, → (n−1)/n for total
  * concentration, and exact agreement with the driver-side Lorenz
  * computation on an uneven mix.
  */
class GiniConcentrationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(masses: Seq[(String, Long)]): (Long, Long, Double) = {
    val dir = tmpDir("gini")
    masses.zipWithIndex.map { case ((src, chars), i) =>
      (i.toLong, "x", "en", src, chars)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = GiniConcentration.q152.build(spark, dir).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  private def bruteGini(masses: Seq[Long]): Double = {
    val xs = masses.sorted
    val n = xs.length.toLong
    val num = xs.zipWithIndex.map { case (x, i) =>
      (2L * (i + 1) - n - 1) * x
    }.sum
    num.toDouble / (n.toDouble * xs.sum.toDouble)
  }

  test("perfectly even mix has Gini exactly 0") {
    val (n, total, g) = run((1 to 8).map(i => (s"src$i", 1000L)))
    assert(n === 8L && total === 8000L && g === 0.0)
  }

  test("one dominant source approaches (n-1)/n") {
    val masses = (1 to 9).map(i => (s"tiny$i", 1L)) :+ ("whale", 100000L)
    val (_, _, g) = run(masses)
    assert(g > 0.88 && g <= 0.9, s"10-source near-total concentration: $g")
  }

  test("uneven mix equals the driver-side Lorenz computation exactly; " +
      "per-source masses aggregate across documents") {
    val perDoc = (0 until 300).map { i =>
      (s"src${i % 7}", (100 + i * 13 % 900).toLong)
    }
    val (nSrc, total, g) = run(perDoc)
    val bySrc = perDoc.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .values.toSeq
    assert(nSrc === 7L && total === perDoc.map(_._2).sum)
    assert(g === math.rint(bruteGini(bySrc) * 1e6) / 1e6)
  }
}
