package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[RepetitionAudit]] (X183) oracles: hand-planted loop texts where
  * the top-2-gram mass and duplicate-4-gram mass are countable on
  * paper (including the >1 overlap cap), clean text passes, the
  * empty-doc zero contract, and sf0.001 ≡ a full driver replay.
  */
class RepetitionAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, String, Double, Double, Boolean)] =
    RepetitionAudit.audit(docs.toDF("doc_id", "text")).collect()
      .map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getAs[String]("top2_gram"), r.getAs[Double]("top2_frac"),
          r.getAs[Double]("dup4_frac"), r.getAs[Boolean]("pass")))
      }.toMap

  test("keyword stuffing: 'spam spam spam spam' — top bigram covers " +
      "3x9 = 27 of 19 chars, capped at 1.0; no duplicate 4-gram") {
    val out = run(Seq((1L, "spam spam spam spam")))
    val (nw, nc, gram, top2, dup4, pass) = out(1L)
    assert(nw === 4L && nc === 19L)
    assert(gram === "spam spam")
    assert(top2 === 1.0)
    assert(dup4 === 0.0)
    assert(!pass)
  }

  test("alternating loop 'a b a b a b a b': top2 = 4x3/15 = 0.8, " +
      "dup-4 mass 3x7 + 2x7 caps at 1.0") {
    val out = run(Seq((2L, "a b a b a b a b")))
    val (_, nc, gram, top2, dup4, pass) = out(2L)
    assert(nc === 15L)
    assert(gram === "a b")
    assert(top2 === 4.0 * 3.0 / 15.0)
    assert(dup4 === 1.0)
    assert(!pass)
  }

  test("clean prose passes; the empty doc scores zeros") {
    val out = run(Seq(
      (3L, "the quick brown fox jumps over a lazy dog tonight"),
      (4L, "")))
    assert(out(3L)._6 === true)
    assert(out(3L)._5 === 0.0)
    val (nw, nc, gram, top2, dup4, pass) = out(4L)
    assert(nw === 0L && nc === 0L && gram === null)
    assert(top2 === 0.0 && dup4 === 0.0 && pass)
  }

  test("q220 at sf0.001 ≡ driver replay of grams, top-1 and dup mass") {
    def norm(t: String): String = t.toLowerCase
      .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), norm(r.getString(1))))
    val got = RepetitionAudit.q220.build(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, n) =>
      val words = if (n.isEmpty) Array.empty[String] else n.split(" ")
      def gramsOf(k: Int) = words.sliding(k).filter(_.length == k)
        .map(_.mkString(" ")).toSeq
      val g2 = gramsOf(2).groupBy(identity).map { case (g, o) =>
        (g, o.size)
      }
      val top = if (g2.isEmpty) None
        else Some(g2.toSeq.minBy { case (g, c) => (-c, g) })
      val top2Chars = top.map { case (g, c) => c.toLong * g.length }
        .getOrElse(0L)
      val dup4Chars = gramsOf(4).groupBy(identity).collect {
        case (g, o) if o.size >= 2 => o.size.toLong * g.length
      }.sum
      val r = got(id)
      assert(r.getLong(1) === words.length.toLong, s"n_words $id")
      assert(r.getLong(2) === n.length.toLong, s"n_chars $id")
      assert(Option(r.getAs[String]("top2_gram")) === top.map(_._1),
        s"gram $id")
      if (n.nonEmpty) {
        assert(r.getAs[Double]("top2_frac") ===
          math.min(1.0, top2Chars.toDouble / n.length.toDouble), id)
        assert(r.getAs[Double]("dup4_frac") ===
          math.min(1.0, dup4Chars.toDouble / n.length.toDouble), id)
      }
    }
  }
}
