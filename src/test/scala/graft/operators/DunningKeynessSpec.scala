package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DunningKeyness]] (X245) oracles: a hand-computed G² on a planted
  * two-source corpus, the over-representation direction filter (an
  * UNDER-represented significant token never surfaces), and the
  * global-count floor.
  */
class DunningKeynessSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir("keyness")
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** G² = 2·Σ O·ln(O/E) over the 2×2 (0·ln 0 = 0). */
  private def g2(a: Long, cw: Long, rs: Long, nn: Long): Double = {
    val b = cw - a; val c = rs - a; val dd = nn - rs - b
    val (ea, eb) = (rs.toDouble * cw / nn, (nn - rs).toDouble * cw / nn)
    val (ec, ed) = (rs.toDouble * (nn - cw) / nn,
      (nn - rs).toDouble * (nn - cw) / nn)
    def t(o: Long, e: Double) =
      if (o > 0) o.toDouble * math.log(o / e) else 0.0
    2.0 * (t(a, ea) + t(b, eb) + t(c, ec) + t(dd, ed))
  }

  test("a source-exclusive frequent token is key, with the hand G²") {
    // srcA: "foo" x30 + "base" x30; srcB: "base" x60
    val dir = corpusDir(Seq(
      (1L, (1 to 30).map(_ => "foo").mkString(" ") + " " +
        (1 to 30).map(_ => "base").mkString(" "), "srcA"),
      (2L, (1 to 60).map(_ => "base").mkString(" "), "srcB")))
    val out = DunningKeyness.q277.build(spark, dir).collect()
    // census: N = 120, rs(A) = 60, cw(foo) = 30, a = 30
    val expected = round6(g2(30L, 30L, 60L, 120L))
    val fooRows = out.filter(r => r.getString(1) == "foo")
    assert(fooRows.length === 1)
    val r = fooRows(0)
    assert(r.getString(0) === "srcA")
    assert(r.getLong(2) === 30L) // obs
    assert(r.getLong(3) === 30L) // cw
    assert(r.getDouble(4) === expected)
    // "base" is UNDER-represented in srcA (30/60 vs 90/120 overall)
    // and over-represented in srcB — it may surface only for srcB
    assert(!out.exists(r2 =>
      r2.getString(0) == "srcA" && r2.getString(1) == "base"))
  }

  test("tokens under the 20-occurrence floor never surface") {
    // "rare" appears 19 times, all in srcA — below MinCount
    val dir = corpusDir(Seq(
      (1L, (1 to 19).map(_ => "rare").mkString(" ") + " " +
        (1 to 41).map(_ => "base").mkString(" "), "srcA"),
      (2L, (1 to 60).map(_ => "base").mkString(" "), "srcB")))
    val out = DunningKeyness.q277.build(spark, dir).collect()
    assert(!out.exists(_.getString(1) == "rare"))
  }

  test("balanced sources: nothing is key") {
    val text = (1 to 40).map(_ => "base").mkString(" ")
    val dir = corpusDir(Seq((1L, text, "srcA"), (2L, text, "srcB")))
    val out = DunningKeyness.q277.build(spark, dir).collect()
    assert(out.isEmpty)
  }
}
