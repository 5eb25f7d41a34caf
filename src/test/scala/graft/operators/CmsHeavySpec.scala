package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[graft.functions.expressions.CmsHeavyGate]] + q91 — the sketch gate
  * must never drop a true heavy hitter (CMS one-sided error), and the
  * gated pipeline must equal the ungated exact aggregation.
  */
class CmsHeavySpec extends SparkSpec {
  import spark.implicits._

  test("gate admits every true heavy hitter on a skewed planted stream") {
    // heavy: h0..h4 at 300 each; tail: 3000 singletons
    val stream = ((0 until 5).flatMap(h => Seq.fill(300)(s"h$h")) ++
      (0 until 3000).map(i => s"tail$i")).toDF("tok")
    val bytes = stream
      .agg(count_min_sketch($"tok", lit(0.001), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    val passed = stream
      .filter(graft.functions.expressions.CmsHeavyGate($"tok", bytes, 300L))
      .select($"tok").distinct().as[String].collect().toSet
    assert((0 until 5).forall(h => passed(s"h$h")),
      s"a true heavy hitter was dropped: $passed")
    // sketch probes must line up with what the aggregate inserted:
    // estimates of the planted heavies are >= their true counts
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
    for (h <- 0 until 5)
      assert(sketch.estimateCount(s"h$h".getBytes("UTF-8")) >= 300L,
        s"estimate for h$h underestimates — probe/build representation mismatch")
  }

  test("q91 equals the ungated exact heavy-hitter aggregation") {
    val d = "/root/testdata/sf0.001"
    val gated = SketchQueries.q91.build(spark, d)
      .as[(String, Long)].collect().toSeq
    val toks = graft.sources.Tables(spark, d, "documents")
      .select(explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
    val threshold = toks.count() / 200
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      .filter($"n" >= threshold)
      .orderBy($"n".desc, $"tok")
      .as[(String, Long)].collect().toSeq
    assert(gated === exact)
    assert(gated.nonEmpty, "threshold left no heavy hitters — test is vacuous")
  }

  test("q92: HLL estimates track exact distincts; union row is consistent") {
    val d = "/root/testdata/sf0.001"
    val out = SketchQueries.q92.build(spark, d)
      .as[(String, Long)].collect().toMap
    val toks = graft.sources.Tables(spark, d, "documents")
      .select($"source", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
    val exactBySource = toks.groupBy($"source")
      .agg(countDistinct($"tok").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = toks.select($"tok").distinct().count()
    exactBySource.foreach { case (src, exact) =>
      val est = out(src)
      assert(math.abs(est - exact) <= math.max(2, exact * 0.05),
        s"source $src: HLL estimate $est vs exact $exact")
    }
    // the union-of-stored-sketches row answers global distinct without a
    // second corpus pass — within the same error envelope
    assert(math.abs(out("__all__") - exactAll) <= math.max(2, exactAll * 0.05),
      s"union estimate ${out("__all__")} vs exact $exactAll")
    assert(out.size === exactBySource.size + 1)
  }

  test("the gate filter stays inside whole-stage codegen") {
    // must be a file-backed source: over a LocalRelation the optimizer
    // folds the filter away at plan time and nothing remains to assert
    val toks = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents")
      .select(explode(split($"text", " ")).as("tok"))
    val bytes = toks
      .agg(count_min_sketch($"tok", lit(0.001), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    val plan = toks
      .filter(graft.functions.expressions.CmsHeavyGate($"tok", bytes, 2L))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_cms_heavy") && l.trim.startsWith("*")),
      s"CmsHeavyGate fenced codegen:\n$plan")
  }
}
