package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ExactSubstr]] against an independent naive reference: the naive
  * side finds duplicated ≥ minRun runs by string-equality gram
  * counting and a token-coverage BITMAP (maximal contiguous covered
  * runs), not the engine's gaps-and-islands window — two formulations
  * that must agree exactly.
  */
class ExactSubstrSpec extends AnyFunSuite with SparkSpec {

  private val L = 4

  /** (doc_id, covered tokens, spans, removedTokens, cleanText) by naive
    * gram counting over the corpus. Survivor rule mirrors the operator:
    * first occurrence in (doc_id, pos) order keeps its region.
    */
  private def naive(corpus: Seq[(Long, String)])
      : Map[Long, (Seq[(Int, Int)], String)] = {
    val words = corpus.map { case (id, t) => id -> t.split(" ") }.toMap
    val occ = scala.collection.mutable.Map
      .empty[String, List[(Long, Int)]]
    for ((id, ws) <- words; p <- 0 to ws.length - L) {
      val g = ws.slice(p, p + L).mkString(" ")
      occ(g) = (id, p) :: occ.getOrElse(g, Nil)
    }
    val dupGrams = occ.filter(_._2.size >= 2)
    val survivor: Map[String, (Long, Int)] =
      dupGrams.map { case (g, os) => g -> os.minBy(o => (o._1, o._2)) }.toMap
    words.map { case (id, ws) =>
      // coverage bitmap + the dup positions that cover each token
      val covered = Array.fill(ws.length)(false)
      val dupPos = (0 to ws.length - L).filter { p =>
        dupGrams.contains(ws.slice(p, p + L).mkString(" "))
      }
      dupPos.foreach(p => (p until p + L).foreach(covered(_) = true))
      // spans = maximal contiguous covered runs
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i < ws.length) {
        if (covered(i)) {
          var j = i
          while (j + 1 < ws.length && covered(j + 1)) j += 1
          spans += ((i, j))
          i = j + 1
        } else i += 1
      }
      // a span survives iff it contains a survivor gram occurrence
      val removed = Array.fill(ws.length)(false)
      spans.foreach { case (st, en) =>
        val keeps = dupPos.exists(p => p >= st && p + L - 1 <= en &&
          survivor(ws.slice(p, p + L).mkString(" ")) == ((id, p)))
        if (!keeps) (st to en).foreach(removed(_) = true)
      }
      val clean = ws.zipWithIndex.collect {
        case (w, i2) if !removed(i2) => w
      }.mkString(" ")
      id -> (spans.toSeq, clean)
    }
  }

  private def run(corpus: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val stats = ExactSubstr.dupSpanStats(df, L).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val dedup = ExactSubstr.dedup(df, L).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    (stats, dedup)
  }

  private def check(corpus: Seq[(Long, String)]): Unit = {
    val ref = naive(corpus)
    val (stats, dedup) = run(corpus)
    corpus.foreach { case (id, text) =>
      val (spans, clean) = ref(id)
      val lens = spans.map { case (st, en) => en - st + 1 }
      assert(stats(id) === ((spans.size.toLong, lens.sum.toLong,
        (if (lens.isEmpty) 0 else lens.max).toLong)),
        s"stats diverge for doc $id: got ${stats(id)}, spans=$spans")
      assert(dedup(id)._1 === clean, s"rewrite diverges for doc $id")
      val nKept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(dedup(id)._2 === (text.split(" ").length - nKept).toLong,
        s"n_removed diverges for doc $id")
    }
  }

  test("a planted cross-doc run is flagged with exact boundaries") {
    val shared = "alpha beta gamma delta epsilon"  // 5 words ≥ L=4
    val corpus = Seq(
      1L -> s"one two $shared three four five six",
      2L -> s"seven eight nine ten $shared eleven")
    val (stats, _) = run(corpus)
    // doc 1: run at tokens 2..6; doc 2: tokens 4..8
    assert(stats(1L) === ((1L, 5L, 5L)))
    assert(stats(2L) === ((1L, 5L, 5L)))
    check(corpus)
  }

  test("a shared run one word short of minRun is invisible") {
    val corpus = Seq(
      1L -> "alpha beta gamma x1 x2 x3 x4 x5",
      2L -> "alpha beta gamma y1 y2 y3 y4 y5")
    val (stats, dedup) = run(corpus)
    assert(stats(1L) === ((0L, 0L, 0L)))
    assert(stats(2L) === ((0L, 0L, 0L)))
    assert(dedup(1L)._2 === 0L)
  }

  test("within-doc repetition is duplication too") {
    val corpus = Seq(
      1L -> "p q r s junk1 junk2 p q r s",
      2L -> "unrelated words only here now")
    val (stats, dedup) = run(corpus)
    assert(stats(1L) === ((2L, 8L, 4L)))
    // first occurrence survives, the echo is cut
    assert(dedup(1L)._1 === "p q r s junk1 junk2")
    assert(dedup(1L)._2 === 4L)
    check(corpus)
  }

  test("a verbatim copy loses everything; the original keeps all") {
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val corpus = Seq(1L -> text, 2L -> text,
      3L -> "other content entirely distinct here friend")
    val (stats, dedup) = run(corpus)
    assert(stats(1L) === ((1L, 10L, 10L)))
    assert(dedup(1L)._1 === text, "the original must survive intact")
    assert(dedup(2L)._1 === "", "the copy must be fully cut")
    assert(dedup(2L)._2 === 10L)
    check(corpus)
  }

  test("overlapping duplicated runs merge into one maximal span") {
    // doc 3 shares tokens 0..4 with doc 1 and tokens 3..8 with doc 2:
    // coverage is contiguous 0..8 → ONE span of 9
    val corpus = Seq(
      1L -> "a1 a2 a3 a4 a5 t1 t2 t3 t4",
      2L -> "s1 s2 s3 s4 a4 a5 b1 b2 b3 b4",
      3L -> "a1 a2 a3 a4 a5 b1 b2 b3 b4")
    val (stats, _) = run(corpus)
    assert(stats(3L)._1 === 1L, "overlapping runs must merge")
    assert(stats(3L)._2 === 9L)
    check(corpus)
  }

  test("random corpora agree with the naive reference") {
    val rnd = new scala.util.Random(42)
    // tiny vocab forces heavy accidental gram sharing
    val vocab = Vector("aa", "bb", "cc", "dd")
    (0 until 5).foreach { trial =>
      val corpus = (1L to 12L).map { id =>
        val n = 4 + rnd.nextInt(20)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      check(corpus)
    }
  }
}
