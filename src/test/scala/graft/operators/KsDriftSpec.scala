package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[KsDrift]] (X166) oracles: identical planted distributions → D
  * exactly 0 (no reject), fully separated ones → D_scaled exactly
  * n_a·n_b (reject), a tie-heavy case exercising the RANGE-window CDF
  * step, and sf0.001 ≡ a literal driver replay of the scaled-integer
  * statistic.
  */
class KsDriftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)])
      : Map[(String, String), (Long, Long, Long, Boolean)] = {
    val dir = tmpDir("ks")
    rows.zipWithIndex.map { case ((src, n), i) =>
      (i.toLong, "x", "en", src, n)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    KsDrift.q205.build(spark, dir).collect().map { r =>
      (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("d_scaled"), r.getAs[Boolean]("reject_05")))
    }.toMap
  }

  test("identical distributions: D exactly 0; disjoint supports: " +
      "D_scaled exactly n_a*n_b and rejected; ties exercise the " +
      "range-window CDF") {
    val sameA = (1 to 30).map(i => ("a", (i % 5 + 1) * 10L))
    val sameB = (1 to 30).map(i => ("b", (i % 5 + 1) * 10L))
    val low = (1 to 40).map(_ => ("c", 5L)) // all mass at 5
    val out = run(sameA ++ sameB ++ low)
    assert(out(("a", "b")) === ((30L, 30L, 0L, false)))
    // a vs c: after v=5 the c-side CDF is 1, a-side 0 → gap = n_a·n_b
    assert(out(("a", "c")) === ((30L, 40L, 30L * 40L, true)))
    assert(out(("b", "c"))._3 === 30L * 40L)
  }

  test("q205 at sf0.001 == literal driver replay") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = srcs(i); b = srcs(j)
    } yield {
      val (xa, xb) = (bySrc(a), bySrc(b))
      val (na, nb) = (xa.length.toLong, xb.length.toLong)
      val values = (xa ++ xb).distinct.sorted
      val dScaled = values.map { v =>
        math.abs(xa.count(_ <= v) * nb - xb.count(_ <= v) * na)
      }.max
      val reject = dScaled.toDouble * dScaled.toDouble >
        KsDrift.CSquared * na.toDouble * nb.toDouble * (na + nb).toDouble
      (a, b) -> ((na, nb, dScaled, reject))
    }).toMap
    val got = KsDrift.q205.build(spark, sf0001).collect().map { r =>
      (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("d_scaled"), r.getAs[Boolean]("reject_05")))
    }.toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
