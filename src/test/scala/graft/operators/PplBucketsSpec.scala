package graft.operators

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[BigramLm.buckets]] (q106): the CCNet head/middle/tail cut must be
  * balanced per language, deterministic under ties and repartitioning,
  * and must never move document text through the window exchange.
  */
class PplBucketsSpec extends AnyFunSuite with SparkSpec {

  /** Two languages: 'aa' has 6 docs in three familiarity tiers (corpus
    * bigram 'x x' repeated = familiar; hapax bigrams = unfamiliar),
    * 'bb' has 4 docs sharing ONE corpus so several tie exactly.
    */
  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      // aa: familiarity strictly ordered by how often 'x x' recurs
      (1L, "x x x x x x x", "aa"),
      (2L, "x x x x q1 q2", "aa"),
      (3L, "x x q3 q4 q5", "aa"),
      (4L, "q6 q7 x x", "aa"),
      (5L, "q8 q9 q10 q11", "aa"),
      (6L, "q12 q13 q14 q15 q16", "aa"),
      // bb: docs 7/8/9 are word-for-word identical → exact ties; the
      // doc_id tiebreak alone decides their buckets
      (7L, "y y y z", "bb"),
      (8L, "y y y z", "bb"),
      (9L, "y y y z", "bb"),
      (10L, "w1 w2 w3", "bb")
    ).toDF("doc_id", "text", "lang")
  }

  test("per-language bucket sizes differ by at most one") {
    val sizes = BigramLm.buckets(fixture)
      .groupBy("lang", "bucket").count().collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(2)) }
    sizes.foreach { case (lang, counts) =>
      assert(counts.max - counts.min <= 1,
        s"$lang buckets unbalanced: ${counts.mkString(",")}")
      assert(counts.sum === (if (lang == "aa") 6 else 4))
    }
  }

  test("exact familiarity ties are cut by doc_id, lowest id first") {
    val m = BigramLm.buckets(fixture).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // docs 7/8/9 tie; 10 is strictly less familiar. ntile(3) over the
    // 4-row 'bb' partition gives groups of (2,1,1) in rank order, so
    // the tie MUST resolve 7,8 → head, 9 → middle, 10 → tail
    assert(m(7L) === "head")
    assert(m(8L) === "head")
    assert(m(9L) === "middle")
    assert(m(10L) === "tail")
  }

  test("assignments are invariant under input repartitioning") {
    val base = BigramLm.buckets(fixture).collect().toSeq
    val shuffled = BigramLm.buckets(fixture.repartition(7)).collect().toSeq
    assert(base === shuffled)
  }

  test("strictly ordered tiers land head/middle/tail in order") {
    val m = BigramLm.buckets(fixture).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(m(1L) === "head" && m(2L) === "head")
    assert(m(3L) === "middle" && m(4L) === "middle")
    assert(m(5L) === "tail" && m(6L) === "tail")
  }

  test("text never reaches the window exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.window.WindowExec
    def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
      case q: QueryStageExec => deep(q.plan)
      case r: ReusedExchangeExec => deep(r.child)
      case other => other.children.flatMap(deep)
    })
    val df = TextQueries.q106.build(spark, sf0001)
    df.collect() // materialize AQE's final plans
    val nodes = deep(
      df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan)
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "q106 must bucket through a window")
    windows.foreach(w =>
      assert(!w.output.exists(a => Set("text", "words")(a.name)),
        s"text reached the window: ${w.output.mkString(",")}"))
    // the lang exchange feeding the window moves (id, lang, longs) only
    val langShuffles = nodes.collect {
      case e: ShuffleExchangeLike
          if e.output.exists(_.name == "lang") &&
            e.output.exists(_.name == "n_bigrams") => e
    }
    assert(langShuffles.nonEmpty, "expected the lang-keyed window exchange")
    langShuffles.foreach(e =>
      assert(!e.output.exists(a => Set("text", "words")(a.name)),
        s"text crossed the window exchange: ${e.output.mkString(",")}"))
  }
}
