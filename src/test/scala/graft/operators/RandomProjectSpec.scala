package graft.operators

import graft.SparkSpec

/** [[graft.functions.expressions.RandomProject]] + q89 — all 16
  * projected dims agree with a driver-side fold (the oracle only sees
  * four), the JL distance-preservation property holds at the planted
  * variance, and the projection stays inside whole-stage codegen.
  */
class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  private val (k, dim) = (16, 64)
  private val planes = SimilarityQueries.jlPlanes(k, dim)

  private def load() = graft.sources.Tables(spark, "/root/testdata/sf0.001",
    "embeddings")
    .select($"vec_id", $"embedding".cast("array<double>").as("emb"))

  test("expression matches a driver-side sequential fold on every dim") {
    val df = load().select($"vec_id", $"emb",
      graft.functions.expressions.VectorFunctions
        .randomProject($"emb", planes, k, dim).as("p"))
    df.as[(Long, Seq[Double], Seq[Double])].collect().foreach {
      case (id, emb, p) =>
        assert(p.length === k)
        for (j <- 0 until k) {
          var acc = 0.0
          for (i <- 0 until dim) acc += planes(j * dim + i) * emb(i)
          assert(p(j) === acc, s"vec $id dim $j: fold order must match")
        }
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_random_project") && l.trim.startsWith("*")),
      s"RandomProject fenced codegen:\n$plan")
  }

  test("JL property: scaled projected distances track true distances") {
    // uniform[-1,1] planes have variance 1/3, so E|P(u-v)|^2 = (k/3)|u-v|^2
    // and |P(u-v)|^2 * 3/k estimates |u-v|^2. Assert the MEAN ratio over
    // many pairs lands near 1 and no pair collapses to ~0.
    val vecs = load().as[(Long, Seq[Double])].collect().take(60)
    val ratios = for {
      Seq((_, u), (_, v)) <- vecs.toSeq.combinations(2).take(500).toSeq
      d2 = (0 until dim).map(i => { val d = u(i) - v(i); d * d }).sum
      if d2 > 1e-12
    } yield {
      val p2 = (0 until k).map { j =>
        val pd = (0 until dim)
          .map(i => planes(j * dim + i) * (u(i) - v(i))).sum
        pd * pd
      }.sum
      p2 * 3.0 / k / d2
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2,
      s"mean scaled-distance ratio $mean far from 1 over ${ratios.size} pairs")
    assert(ratios.count(_ < 0.05).toDouble / ratios.size < 0.02,
      "too many pairs collapsed to near-zero projected distance")
  }

  test("q89 output is deterministic and row-complete") {
    val d = "/root/testdata/sf0.001"
    val a = SimilarityQueries.q89.build(spark, d).collect().toSeq
    val b = SimilarityQueries.q89.build(spark, d).collect().toSeq
    assert(a === b)
    assert(a.size === load().count())
  }
}
