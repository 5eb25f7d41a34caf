package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[UniMax.allocate]]'s closed form against the paper's ITERATIVE
  * waterfilling loop: repeatedly split the remaining budget evenly over
  * remaining languages, cap any language whose capacity falls below its
  * share, repeat until stable. The closed form must agree to 1e-6 on
  * every corpus shape, including the all-capped and nobody-capped
  * edges.
  */
class UniMaxSpec extends AnyFunSuite with SparkSpec {

  /** The paper's loop: returns lang -> allocation. */
  private def iterative(caps: Map[String, Long], budget: Long)
      : Map[String, Double] = {
    var capped = Map.empty[String, Double]
    var remaining = caps
    var remB = budget.toDouble
    var changed = true
    while (changed && remaining.nonEmpty) {
      val share = remB / remaining.size
      val below = remaining.filter { case (_, c) => c.toDouble < share }
      changed = below.nonEmpty
      if (changed) {
        capped ++= below.map { case (l, c) => l -> c.toDouble }
        remB -= below.values.sum.toDouble
        remaining = remaining -- below.keys
      }
    }
    val share = if (remaining.isEmpty) 0.0 else remB / remaining.size
    capped ++ remaining.map { case (l, _) => l -> share }
  }

  /** One synthetic doc per (lang, word count) spec. */
  private def corpus(tokens: Map[String, Long]) = {
    val s = spark
    import s.implicits._
    tokens.toSeq.map { case (l, n) =>
      (l, ("w " * n.toInt).trim)
    }.toDF("lang", "text")
  }

  private def checkAgainstIterative(tokens: Map[String, Long],
      budget: Long, epochs: Int): Unit = {
    val got = UniMax.allocate(corpus(tokens), budget, epochs).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("alloc_tokens")).toMap
    val want = iterative(tokens.map { case (l, n) => l -> n * epochs },
      budget)
    tokens.keys.foreach { l =>
      // alloc_tokens is REPORTED at 4 decimals; the iterative value is
      // unrounded — agreement bound is the rounding step
      assert(math.abs(got(l) - want(l)) <= 5.0001e-5,
        s"$l: closed form ${got(l)} vs iterative ${want(l)}")
    }
  }

  test("small languages cap, the dominant one absorbs the rest") {
    val tokens = Map("aa" -> 10L, "bb" -> 12L, "cc" -> 100L)
    val rows = UniMax.allocate(corpus(tokens), budget = 60L, epochs = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("aa").getAs[Boolean]("capped"))
    assert(rows("bb").getAs[Boolean]("capped"))
    assert(!rows("cc").getAs[Boolean]("capped"))
    assert(rows("aa").getAs[Double]("alloc_tokens") === 10.0)
    assert(rows("bb").getAs[Double]("alloc_tokens") === 12.0)
    // cc takes what remains: 60 − 22 = 38
    assert(rows("cc").getAs[Double]("alloc_tokens") === 38.0)
    assert(rows("cc").getAs[Double]("epochs_used") === 0.38)
    checkAgainstIterative(tokens, 60L, 1)
  }

  test("budget above total capacity caps everyone") {
    val tokens = Map("aa" -> 5L, "bb" -> 7L)
    val rows = UniMax.allocate(corpus(tokens), budget = 1000L, epochs = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("aa").getAs[Double]("alloc_tokens") === 10.0)
    assert(rows("bb").getAs[Double]("alloc_tokens") === 14.0)
    checkAgainstIterative(tokens, 1000L, 2)
  }

  test("equal-size languages split the budget evenly, none capped") {
    val tokens = Map("aa" -> 50L, "bb" -> 50L, "cc" -> 50L)
    val rows = UniMax.allocate(corpus(tokens), budget = 90L, epochs = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    tokens.keys.foreach { l =>
      assert(!rows(l).getAs[Boolean]("capped"))
      assert(rows(l).getAs[Double]("alloc_tokens") === 30.0)
    }
    checkAgainstIterative(tokens, 90L, 1)
  }

  test("the epoch cap binds before raw corpus size") {
    // bb could absorb more of the budget than its even share, but may
    // only repeat 2×: capacity 40 < the 50-token split → capped at 2
    // epochs, aa takes the remainder
    val tokens = Map("aa" -> 100L, "bb" -> 20L)
    val rows = UniMax.allocate(corpus(tokens), budget = 100L, epochs = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("bb").getAs[Boolean]("capped"))
    assert(rows("bb").getAs[Double]("alloc_tokens") === 40.0)
    assert(rows("bb").getAs[Double]("epochs_used") === 2.0)
    assert(rows("aa").getAs[Double]("alloc_tokens") === 60.0)
    checkAgainstIterative(tokens, 100L, 2)
  }

  test("random corpora agree with the iterative reference") {
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val nLangs = 2 + rnd.nextInt(6)
      val tokens = (0 until nLangs)
        .map(i => s"l$i" -> (1L + rnd.nextInt(200))).toMap
      val total = tokens.values.sum
      val budget = 1L + rnd.nextInt((2 * total).toInt)
      val epochs = 1 + rnd.nextInt(3)
      checkAgainstIterative(tokens, budget, epochs)
    }
  }
}
