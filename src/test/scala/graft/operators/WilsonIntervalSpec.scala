package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[WilsonInterval]] (X241) oracles: the Wilson bounds replay on a
  * planted pass/fail ledger, the p̂ ∈ {0,1} sanity (bounds stay inside
  * [0,1] where Wald collapses), the pooled two-proportion z against
  * the rest, and the single-source NULL z.
  */
class WilsonIntervalSpec extends SparkSpec {
  import spark.implicits._

  private val Z = 1.9599639845400536d

  private val passText = (1 to 30).map(i => s"word$i").mkString(" ")
  private val failText = "tiny doc"

  /** (source, passes): plants `passes` gate-passing docs and fills to
    * `total` with failing ones.
    */
  private def run(spec: Seq[(String, Int, Int)])
      : Map[String, (Long, Long, Double, Double, Double,
        Option[Double], Option[Boolean])] = {
    val dir = tmpDir("wilson")
    val rows = for {
      ((src, passes, total), s) <- spec.zipWithIndex
      i <- 0 until total
    } yield (s.toLong * 1000 + i,
      if (i < passes) passText else failText, src)
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    WilsonInterval.q281.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        if (r.isNullAt(7)) None else Some(r.getBoolean(7))))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def wilson(x: Long, n: Long): (Double, Double) = {
    val nd = n.toDouble
    val p = x.toDouble / nd
    val z2 = Z * Z
    val denom = 1.0 + z2 / nd
    val center = p + z2 / (2.0 * nd)
    val spread = Z * math.sqrt(p * (1.0 - p) / nd +
      z2 / (4.0 * nd * nd))
    (round6((center - spread) / denom), round6((center + spread) / denom))
  }

  test("bounds match the replay; anomalous source flagged by z") {
    // s1: 18/20, s2: 90/100, s3: 10/40 — s3 is the outlier
    val out = run(Seq(("s1", 18, 20), ("s2", 90, 100), ("s3", 10, 40)))
    val (n1, x1, p1, lo1, hi1, _, _) = out("s1")
    assert((n1, x1) === ((20L, 18L)))
    assert(p1 === 0.9)
    assert((lo1, hi1) === wilson(18, 20))
    // pooled z for s3 vs rest: p3 = .25, pr = 108/120 = .9
    val (_, _, _, _, _, z3, flag3) = out("s3")
    val pp = 118.0 / 160.0
    val expected = round6((0.25 - 0.9) /
      math.sqrt(pp * (1 - pp) * (1.0 / 40 + 1.0 / 120)))
    assert(z3 === Some(expected))
    assert(flag3 === Some(true))
  }

  test("p̂ = 1 and p̂ = 0: bounds stay strictly inside [0,1]") {
    val out = run(Seq(("all", 10, 10), ("none", 0, 10), ("mix", 5, 10)))
    val (_, _, pAll, loAll, hiAll, _, _) = out("all")
    assert(pAll === 1.0)
    assert((loAll, hiAll) === wilson(10, 10))
    assert(loAll > 0.0 && hiAll === 1.0)
    val (_, _, pNone, loNone, hiNone, _, _) = out("none")
    assert(pNone === 0.0)
    assert((loNone, hiNone) === wilson(0, 10))
    assert(loNone === 0.0 && hiNone < 1.0)
  }

  test("single source: no rest to compare against, NULL z") {
    val out = run(Seq(("only", 3, 5)))
    assert(out("only")._6 === None && out("only")._7 === None)
  }
}
