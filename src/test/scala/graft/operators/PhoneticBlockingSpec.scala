package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PhoneticBlocking]] (X199) oracles: the pinned Soundex variant on
  * the classic name pairs (plus the documented H/W-rule divergence,
  * asserted so it cannot silently change), the census/pair arithmetic
  * on a planted collision, and q235 at sf0.001 ≡ a driver replay of
  * the code over every first token.
  */
class PhoneticBlockingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def codeOf(toks: String*): Seq[String] =
    toks.toDF("t").select(PhoneticBlocking.code(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq

  /** Driver-side replay of the pinned algorithm. */
  private def ref(tok: String): String = {
    val letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val codes = "01230120022455012623010202"
    val up = tok.toUpperCase
    val mapped = up.map(ch => {
      val i = letters.indexOf(ch); if (i < 0) ch else codes(i)
    }).mkString
    val collapsed = (1 to 6).foldLeft(mapped)((m, d) =>
      m.replaceAll(s"$d{2,}", d.toString))
    val noZero = collapsed.replace("0", "")
    val firstCode = {
      val i = letters.indexOf(up.head); if (i < 0) "?" else codes(i).toString
    }
    val rest = if (firstCode == "0") noZero
      else noZero.drop(1).take(3)
    up.head.toString + rest.take(3).padTo(3, '0')
  }

  test("classic Soundex values reproduce: ROBERT/RUPERT -> R163, " +
      "SMITH/SMYTH -> S530, vowel-led names keep their full tail") {
    assert(codeOf("robert", "rupert") === Seq("R163", "R163"))
    assert(codeOf("smith", "smyth") === Seq("S530", "S530"))
    assert(codeOf("euler") === Seq("E460"))
    assert(codeOf("gauss", "ghosh") === Seq("G200", "G200"))
  }

  test("the pinned divergence from classic Soundex is exactly the " +
      "H/W transparency rule: ASHCRAFT -> A226 here (classic A261)") {
    assert(codeOf("ashcraft") === Seq("A226"))
  }

  test("code == driver replay on a token zoo (short, vowel-only, " +
      "run-heavy)") {
    val zoo = Seq("a", "ae", "pfister", "tymczak", "jackson",
      "honeyman", "lloyd", "czarkowska", "oo", "b")
    assert(codeOf(zoo: _*) === zoo.map(ref))
  }

  test("planted collision census: pair arithmetic is exact") {
    val dir = tmpDir("phon")
    // smith x3 and smyth x2 share S530: n_parts=5, n_tokens=2,
    // within = 3+1=4, total = 10, cross = 6
    Seq("smith", "smith", "smith", "smyth", "smyth", "lime")
      .zipWithIndex
      .map { case (n, i) => (i.toLong, s"$n extra words") }
      .toDF("p_partkey", "p_name")
      .selectExpr("p_partkey", "p_name", "'B' as p_brand",
        "'T' as p_type", "1 as p_size", "1.0 as p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = PhoneticBlocking.q235.build(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5)))).toMap
    assert(out("S530") === ((5L, 2L, "smith", "smyth", 6L)))
    assert(out("L500") === ((1L, 1L, "lime", "lime", 0L)))
  }

  test("q235 at sf0.001 == driver replay over every first token") {
    val toks = spark.read.parquet(s"$sf0001/part.parquet")
      .select(split(col("p_name"), " ").getItem(0).as("t"))
      .collect().map(_.getString(0))
    val exp = toks.groupBy(ref).toSeq.map { case (code, ts) =>
      val byTok = ts.groupBy(identity).map { case (_, g) => g.size }
      val n = ts.size.toLong
      val within = byTok.map(c => c.toLong * (c - 1) / 2).sum
      code -> ((n, byTok.size.toLong, ts.min, ts.max,
        n * (n - 1) / 2 - within))
    }.toMap
    val got = PhoneticBlocking.q235.build(spark, sf0001).collect()
    assert(got.nonEmpty && got.length === exp.size)
    got.foreach { r =>
      assert(exp(r.getString(0)) === ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5))),
        s"code ${r.getString(0)}")
    }
  }
}
