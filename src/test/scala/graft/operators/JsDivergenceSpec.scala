package graft.operators

import graft.SparkSpec

/** [[JsDivergence]] (X218) oracles: hand-computed JSD on a planted
  * two-language mixture with a one-sided category, the identical-mix
  * zero, and the empty-half exclusion.
  */
class JsDivergenceSpec extends SparkSpec {
  import spark.implicits._

  /** Plant docs as (block, source, lang); block 0 → doc_id 0..19
    * range, block 1 → 20..39 (doc_id div 20 parity).
    */
  private def run(rows: Seq[(Int, String, String)])
      : Map[String, (Long, Long, Long, Option[Double])] = {
    val dir = tmpDir("jsd")
    val counters =
      scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val docs = rows.map { case (block, src, lang) =>
      val w = counters(block)
      counters(block) = w + 1
      require(w < 20, "20 docs per block max (doc_id div 20 parity)")
      ((block * 20 + w).toLong, "text body here", lang, src, 14L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    JsDivergence.q251.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    }.toMap
  }

  private def dec14(x: Double): BigDecimal =
    BigDecimal(x).setScale(14, BigDecimal.RoundingMode.HALF_UP)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand case: {en .5, fr .5} vs {en 1}") {
    val rows =
      Seq.fill(2)((0, "s0", "en")) ++ Seq.fill(2)((0, "s0", "fr")) ++
        Seq.fill(4)((1, "s0", "en"))
    val out = run(rows)
    val (nE, nO, nL, jsd) = out("s0")
    assert((nE, nO, nL) === ((4L, 4L, 2L)))
    val termEn = 0.5 * math.log(2.0 * 0.5 / 1.5) +
      1.0 * math.log(2.0 * 1.0 / 1.5)
    val termFr = 0.5 * math.log(2.0 * 0.5 / 0.5)
    val expect = round6(
      ((dec14(termEn) + dec14(termFr)).toDouble) / 2.0)
    assert(jsd === Some(expect))
  }

  test("identical mixes: JSD exactly 0") {
    val rows = Seq.fill(3)((0, "s0", "en")) ++ Seq.fill(3)((1, "s0", "en"))
    assert(run(rows)("s0")._4.exists(_ == 0.0))
  }

  test("a source with an empty half is excluded") {
    val rows = Seq.fill(3)((0, "solo", "en")) ++
      Seq.fill(2)((0, "s0", "en")) ++ Seq.fill(2)((1, "s0", "en"))
    val out = run(rows)
    assert(!out.contains("solo") && out.contains("s0"))
  }
}
