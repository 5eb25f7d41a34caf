package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SpanCorruption]] against an independent plain-Scala replay of the
  * LCG → islands → sentinel-rewrite pipeline, plus structural
  * invariants the T5 objective needs.
  */
class SpanCorruptionSpec extends AnyFunSuite with SparkSpec {

  /** Independent reference on pre-normalized text. */
  private def ref(docId: Long, words: Vector[String])
      : (String, String, Long, Long) = {
    val n = words.size
    val masked = scala.collection.mutable.SortedSet.empty[Int]
    (0 until n).foreach { pos =>
      val seed = (docId * 1000003L + pos) % 1000000007L
      val u = (seed * 1103515245L + 12345L) % 1000000L
      if (u < 50000L) {
        val en = math.min(pos + 1 + (u % 3L).toInt, n - 1)
        (pos to en).foreach(masked += _)
      }
    }
    // islands over the sorted masked positions
    val islands = masked.toVector.foldLeft(Vector.empty[Vector[Int]]) {
      case (acc, p) if acc.nonEmpty && p - acc.last.last <= 1 =>
        acc.init :+ (acc.last :+ p)
      case (acc, p) => acc :+ Vector(p)
    }
    val startK = islands.zipWithIndex.map { case (is, k) => is.head -> k }.toMap
    val input = (0 until n).flatMap { i =>
      if (startK.contains(i)) Some(s"<extra_id_${startK(i)}>")
      else if (masked.contains(i)) None
      else Some(words(i))
    }.mkString(" ")
    val target = islands.zipWithIndex.map { case (is, k) =>
      (s"<extra_id_$k>" +: is.map(words)).mkString(" ")
    }.mkString(" ")
    (input, target, masked.size.toLong, islands.size.toLong)
  }

  private def run(corpus: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    SpanCorruption.corrupt(corpus.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("input_text"), r.getAs[String]("target_text"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"),
          r.getAs[Long]("n_spans"))))
      .toMap
  }

  test("matches the plain-Scala replay on random corpora") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("mountain", "river", "cloud", "stone", "wind",
      "a", "bb", "ccc", "train", "data")
    val corpus = (1L to 50L).map { id =>
      id -> Seq.fill(5 + rnd.nextInt(60))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = run(corpus)
    corpus.foreach { case (id, text) =>
      val words = text.split(" ").toVector
      val (refIn, refTgt, refMasked, refSpans) = ref(id, words)
      val (in, tgt, nTok, nMasked, nSpans) = got(id)
      assert(nTok === words.size.toLong, s"doc $id n_tokens")
      assert(in === refIn, s"doc $id input")
      assert(tgt === refTgt, s"doc $id target")
      assert(nMasked === refMasked, s"doc $id n_masked")
      assert(nSpans === refSpans, s"doc $id n_spans")
    }
    // the rate parameters actually fire on a corpus this size
    assert(got.values.map(_._4).sum > 0, "no tokens masked anywhere")
    assert(got.values.exists(_._5 == 0L) ||
      got.values.forall(_._4 > 0L), "sanity")
  }

  test("round-trip: sentinels + target reconstruct every document") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("x", "yy", "zzz", "word", "token")
    val corpus = (1L to 25L).map { id =>
      id -> Seq.fill(10 + rnd.nextInt(40))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    run(corpus).foreach { case (id, (in, tgt, nTok, nMasked, _)) =>
      // splice each <extra_id_k> span from the target back into the
      // input at its sentinel — must reproduce the original text
      val spans = tgt.split("<extra_id_\\d+> ?").toVector
        .filter(_.nonEmpty).map(_.trim)
      var rebuilt = in
      spans.zipWithIndex.foreach { case (content, k) =>
        rebuilt = rebuilt.replace(s"<extra_id_$k>", content)
      }
      val original = corpus.find(_._1 == id).get._2
      assert(rebuilt === original, s"doc $id round-trip")
      assert(in.split(" ").count(!_.startsWith("<extra_id_")) ===
        (nTok - nMasked).toInt, s"doc $id kept-token count")
    }
  }

  test("masking is deterministic across runs") {
    val corpus = Seq(7L -> "one two three four five six seven eight nine ten")
    assert(run(corpus) === run(corpus))
  }
}
