package graft.operators

import graft.SparkSpec

/** [[Bpe]] — tokenizer training and encoding. The oracle for q88 (the
  * merge loop is not SQL-expressible): hand-computed merges on a
  * planted corpus, lossless segmentation, expression/driver agreement,
  * and first-merge equality with the DuckDB-oracled q86 kernel.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges match the hand-computed sequence on a planted corpus") {
    // corpus: "aaab" x3, "ab" x2.
    //   round 1: (a,a)=6 beats (a,b)=5            -> aaab = [aa,a,b]
    //   round 2: (a,b)=3+2=5 beats (aa,a)=3       -> [aa,ab], [ab]
    //   round 3: only (aa,ab)=3 remains           -> [aaab], [ab]
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 5)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")),
      "training must stop when no pairs remain and break ties (count desc, pair asc)")
  }

  test("incremental trainer is bit-identical to the naive rescan loop") {
    // deterministic word-soup vocab: enough shared subwords that merges
    // interact (created pairs win later rounds), exercising the
    // occurrence-index maintenance the incremental path depends on
    var seed = 42L
    def next(m: Int): Int = { seed = seed * 1103515245L + 12345L
      ((seed % m + m) % m).toInt }
    val alphabet = "abcde"
    val vocab = (1 to 400).map { _ =>
      val w = (0 until (2 + next(9)))
        .map(_ => alphabet(next(alphabet.length))).mkString
      (w, (1 + next(50)).toLong)
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    for (n <- Seq(1, 5, 50, 500))
      assert(Bpe.trainFromVocab(vocab, n) === BpeNaive.trainFromVocab(vocab, n),
        s"divergence at nMerges=$n")
    // exhaustion: both must stop at the same merge count when no pairs
    // remain, well before the requested 10k
    val inc = Bpe.trainFromVocab(vocab, 10000)
    assert(inc === BpeNaive.trainFromVocab(vocab, 10000))
    assert(inc.size < 10000, "exhaustion never reached — vocab unconsumed?")
  }

  test("encoding is greedy by rank and lossless") {
    val ranks = Bpe.ranks(Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    assert(Bpe.encodeWord("aaab", ranks).toSeq === Seq("aaab"))
    // (a,a) fires first by rank, leaving [aa,b] with no ranked pair —
    // NOT the [a,ab] a left-to-right-by-position encoder would produce
    assert(Bpe.encodeWord("aab", ranks).toSeq === Seq("aa", "b"))
    assert(Bpe.encodeWord("ba", ranks).toSeq === Seq("b", "a"))
    assert(Bpe.encodeWord("x", ranks).toSeq === Seq("x"))
    for (w <- Seq("aaaaab", "abab", "bbaa", "aba", ""))
      assert(Bpe.encodeWord(w, ranks).mkString === w,
        s"segmentation of '$w' must concatenate back to the word")
    assert(Bpe.countTokens("aaab ab aab", ranks) === 1 + 1 + 2)
  }

  test("expression agrees with the driver-side encoder and stays codegen'd") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, d, "documents")
      .select($"doc_id", $"text")
    val merges = Bpe.train(docs, nMerges = 10)
    val ranks = Bpe.ranks(merges)
    val df = docs
      .select($"doc_id",
        graft.functions.MockScorers.normalize($"text").as("norm"))
      .select($"doc_id", $"norm",
        graft.functions.expressions.BpeTokenCount($"norm", merges)
          .as("n_bpe"))
    df.as[(Long, String, Int)].collect().foreach { case (id, norm, n) =>
      assert(n === Bpe.countTokens(norm, ranks),
        s"doc $id: expression and driver encoder disagree")
    }
    // the projection must not fall out of whole-stage codegen: the
    // `*(n)` prefix marks operators inside a codegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_bpe_tokens") && l.trim.startsWith("*")),
      s"BpeTokenCount fenced codegen:\n$plan")
  }

  test("first learned merge equals the oracled q86 top pair on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, d, "documents")
      .select($"doc_id", $"text")
    val Seq((a, b), _*) = Bpe.train(docs, nMerges = 1)
    val top = TextQueries.q86.build(spark, d)
      .select($"pair").as[String].head()
    assert(a + b === top,
      "train round 1 must reproduce the DuckDB-checked q86 kernel")
  }

  test("q88 tokenizes the corpus: fewer tokens than chars, more than words") {
    val out = TextQueries.q88.build(spark, "/root/testdata/sf0.001")
      .as[(Long, Int, Int, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, bpe, ws, chars) =>
      assert(bpe >= ws, s"doc $id: a word never splits below 1 token")
      assert(bpe <= chars, s"doc $id: tokens can never exceed characters")
    }
    // 30 merges on word-soup text must actually compress somewhere
    assert(out.exists { case (_, bpe, _, chars) => bpe < chars },
      "no document compressed below character count — merges unused?")
  }

  /** Scala mirror of the q88 oracle SQL's encode replay: '|'-wrapped
    * symbols, rank-ordered merges, TWO left-to-right non-overlapping
    * replace passes per rank (java String.replace has exactly DuckDB
    * replace's matching semantics). Token count = '|' count − 1.
    */
  private def replayCount(word: String,
      merges: Seq[(String, String)]): Int = {
    var s = "|" + word.flatMap(c => s"$c|")
    merges.foreach { case (a, b) =>
      val pat = s"|$a|$b|"
      val rep = s"|$a$b|"
      s = s.replace(pat, rep).replace(pat, rep)
    }
    s.count(_ == '|') - 1
  }

  test("q88 oracle replay (rank-ordered two-pass replace) equals the " +
      "greedy encoder on adjacent-chain fixtures and the full " +
      "sf0.001 vocabulary") {
    // adversarial chains: every shared-boundary configuration the
    // two-pass argument covers (alternating chains of every parity,
    // multi-rank cascades onto merged symbols) — all x≠y merges, the
    // shape the oracle guard admits
    val merges = Seq("a" -> "b", "ab" -> "c", "ab" -> "a", "x" -> "y",
      "c" -> "xy")
    val ranks = Bpe.ranks(merges)
    val words = Seq("ab", "abab", "ababa", "ababab", "abababab",
      "abc", "abcabc", "ababc", "cab", "cababc", "aba", "abaaba",
      "xy", "xyxy", "xyxyxy", "xyxyxyxy", "xyxyx", "cxy", "cxycxy",
      "abcxy", "axbyc", "ba", "cba", "", "q",
      "abababababababababab", "xyxyxyxyxyxyxyxyxyxy")
    words.foreach { w =>
      assert(replayCount(w, merges) === Bpe.encodeWord(w, ranks).length,
        s"replay diverges from greedy on '$w'")
    }
    // the guard's justification: a SELF-pair merge (x,x) has
    // overlapping token-space occurrences, and the string replay
    // settles on a different fixpoint than the greedy encoder on
    // 6-chains — q88OracleSql falls back to rows-only for such tables
    val selfPair = Seq("a" -> "b", "ab" -> "ab")
    val selfRanks = Bpe.ranks(selfPair)
    assert(replayCount("abababababab", selfPair) !==
      Bpe.encodeWord("abababababab", selfRanks).length,
      "the self-pair divergence the oracle guard exists for")
    // the real learned table on the real vocabulary — the exact
    // configuration the driver's DuckDB gate replays at sf0.01
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, d, "documents")
    val learned = Bpe.train(docs, nMerges = 30)
    assert(!learned.exists { case (a, b) => a == b },
      "self-pair merge learned — q88OracleSql must fall back (and " +
        "this corpus check no longer applies)")
    val learnedRanks = Bpe.ranks(learned)
    val vocab = Bpe.vocab(docs).select($"w").as[String].collect()
    assert(vocab.length > 20, "fixture vocabulary unexpectedly small")
    vocab.foreach { w =>
      assert(replayCount(w, learned) ===
        Bpe.encodeWord(w, learnedRanks).length,
        s"replay diverges from greedy on corpus word '$w'")
    }
  }
}
