package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[QualityClassifier]] against an independent plain-Scala reference
  * of the hash → bucket → LCG-weight → margin pipeline.
  */
class QualityClassifierSpec extends AnyFunSuite with SparkSpec {

  /** Independent reimplementation on PRE-NORMALIZED text (lowercase
    * alnum + single spaces, so normalize() is the identity on it).
    */
  private def refMargin(words: Seq[String]): (Long, Double, Boolean) = {
    val s = words.map { w =>
      val h = w.length.toLong * 17L + w.head.toLong * 31L + w.last.toLong
      val b = h % 4096L
      ((b * 1103515245L + 12345L) % 2001L + 2001L) % 2001L - 1000L
    }.sum
    (s, BigDecimal(s.toDouble / (1000.0 * words.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s >= 0L)
  }

  private def run(corpus: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    QualityClassifier.score(corpus.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("margin"),
          r.getAs[Boolean]("keep"))))
      .toMap
  }

  test("margins match the plain-Scala reference on random corpora") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "x1", "y22", "z333")
    val corpus = (1L to 40L).map { id =>
      val n = 1 + rnd.nextInt(30)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = run(corpus)
    corpus.foreach { case (id, text) =>
      val words = text.split(" ").toSeq
      val (_, margin, keep) = refMargin(words)
      val (nTok, gotMargin, gotKeep) = got(id)
      assert(nTok === words.size, s"doc $id token count")
      assert(gotMargin === margin, s"doc $id margin")
      assert(gotKeep === keep, s"doc $id keep")
    }
  }

  test("the frozen weights split a corpus — both verdicts occur") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString) ++
      Seq("the", "and", "data", "spark", "quality")
    val corpus = (1L to 60L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val keeps = run(corpus).values.map(_._3).toSeq
    assert(keeps.contains(true) && keeps.contains(false),
      "a one-sided classifier filters nothing (or everything)")
  }

  test("keep decides on the integer sum, not the rounded margin") {
    // single word whose bucket weight is negative: margin rounds to a
    // tiny negative value; keep must be false even if the ROUNDED
    // margin were to land on -0.0 for longer docs of the same word
    val vocab = ('a' to 'z').map(_.toString * 3)
    val weights = vocab.map { w =>
      w -> refMargin(Seq(w))._1
    }
    val neg = weights.collectFirst { case (w, s) if s < 0 => w }.get
    // 999 repeats: |sum| large, margin well-defined; and one repeat
    val got = run(Seq(1L -> Seq.fill(999)(neg).mkString(" "), 2L -> neg))
    assert(!got(1L)._3 && !got(2L)._3)
    assert(got(1L)._2 < 0 && got(2L)._2 < 0)
  }
}
