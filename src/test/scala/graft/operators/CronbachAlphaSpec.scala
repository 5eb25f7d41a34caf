package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CronbachAlpha]] (X240) oracles: α on a hand-featured two-doc
  * fixture, replication invariance of the population variances, and
  * the zero-total-variance NULL.
  */
class CronbachAlphaSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(texts: Seq[String]): String = {
    val dir = tmpDir("cronbach")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "src") }
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(texts: Seq[String])
      : (Long, Option[Double], Option[Double]) = {
    val r = CronbachAlpha.q279.build(spark, corpusDir(texts))
      .collect()(0)
    (r.getLong(0),
      if (r.isNullAt(5)) None else Some(r.getDouble(5)),
      if (r.isNullAt(6)) None else Some(r.getDouble(6)))
  }

  private def round4(x: Double): BigDecimal =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's four 4-dp items, replayed on a raw text. */
  private def items(text: String): Seq[BigDecimal] = {
    val norm = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    val nWords = norm.split(" ").length
    val nChars = text.length
    def count(re: String, s: String): Int =
      re.r.findAllMatchIn(s).size
    val i1 = round4(math.min(1.0, nWords.toDouble / 50))
    val i2 = BigDecimal(1) -
      round4(count("[^a-zA-Z0-9 ]", text).toDouble / nChars)
    val i3 = round4(
      count("\\b(the|of|and|to|is|a)\\b", norm).toDouble / nWords)
    val i4 = BigDecimal(1) -
      round4(count("[0-9]", text).toDouble / nChars)
    Seq(i1, i2, i3, i4)
  }

  /** α from exact decimal item sums, the operator's popVar tree. */
  private def replay(texts: Seq[String]): Option[Double] = {
    val rows = texts.map(items)
    val n = rows.size
    def popVar(vals: Seq[BigDecimal]): Double = {
      val s = vals.sum.toDouble
      val q = vals.map(v => v * v).sum.toDouble
      (n * q - s * s) / (n.toDouble * n)
    }
    val vs = (0 until 4).map(j => popVar(rows.map(_(j))))
    val vt = popVar(rows.map(_.sum))
    if (vt > 0 && n > 1)
      Some(round6((4.0 / 3.0) * (1.0 - vs.sum / vt)))
    else None
  }

  test("two-doc fixture: α matches the exact item replay") {
    val texts = Seq("the cat sat on mat", "of dog and bird to go home")
    val (n, vt, alpha) = run(texts)
    assert(n === 2L)
    assert(alpha === replay(texts))
    assert(vt.get > 0)
  }

  test("duplicating every doc leaves population variances and α fixed") {
    val texts = Seq("the cat sat on mat", "of dog and bird to go home",
      "plain words without stops here 42")
    val (_, _, a1) = run(texts)
    val (_, _, a2) = run(texts ++ texts)
    assert(a1 === replay(texts))
    assert(a2 === a1)
  }

  test("identical docs: zero total variance, NULL α") {
    val (n, vt, alpha) = run(Seq("same text here", "same text here"))
    assert(n === 2L)
    assert(vt === Some(0.0))
    assert(alpha === None)
  }
}
