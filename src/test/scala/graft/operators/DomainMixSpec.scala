package graft.operators

import graft.SparkSpec

/** [[DomainMix]] — mixture planning and deterministic rate sampling. */
class DomainMixSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  // two sources: "web" 400 tokens across 4 docs, "books" 100 in 1 doc
  private def corpus = Seq(
    (1L, "web", words(100)), (2L, "web", words(100)),
    (3L, "web", words(100)), (4L, "web", words(100)),
    (5L, "books", words(100)))
    .toDF("doc_id", "source", "text")

  test("equal-share plan: oversubscribed source downsamples, small keeps all") {
    // budget 400, 2 sources → 200 tokens each: web rate 200/400 = 0.5,
    // books min(1, 200/100) = 1.0
    val plan = DomainMix.planEqualShares(corpus, tokenBudget = 400)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(plan === Seq(("books", 1L, 100L, 1.0), ("web", 4L, 400L, 0.5)))
  }

  test("sampling is deterministic and respects per-source rates") {
    val docs = (1L to 2000L).map { i =>
      (i, if (i % 2 == 0) "web" else "books", words(10))
    }.toDF("doc_id", "source", "text")
    val plan = Seq(("web", 0.25), ("books", 1.0)).toDF("source", "rate")
    val a = DomainMix.sample(docs, plan)
      .select("doc_id").as[Long].collect().toSet
    val b = DomainMix.sample(docs, plan)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "hash sampling must be retry-stable")
    val kept = docs.filter($"doc_id".isin(a.toSeq: _*))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("books") === 1000L, "rate-1.0 source must keep every doc")
    // 1000 web docs at rate 0.25: binomial mean 250, assert a wide band
    assert(kept("web") > 150 && kept("web") < 350,
      s"web keep-count far off the 0.25 rate: ${kept("web")}")
    // sampled frame keeps the original columns (rate dropped)
    assert(DomainMix.sample(docs, plan).columns.toSet ===
      Set("doc_id", "source", "text"))
  }

  test("integer-threshold sampling: rate-1 source keeps all, retry-stable") {
    val docs = (1L to 2000L).map { i =>
      (i, if (i % 2 == 0) "web" else "books", words(if (i % 2 == 0) 40 else 1))
    }.toDF("doc_id", "source", "text")
    // budget 20000, 2 sources → 10000 tokens/source. books mass 1000
    // (under budget → thresh 1e6, keeps all); web mass 40000 → thresh
    // floor(1e6 · 10000/40000) = 250000 → ~25% of docs.
    val a = DomainMix.sampleThresholds(docs, tokenBudget = 20000)
      .select("doc_id").as[Long].collect().toSet
    val b = DomainMix.sampleThresholds(docs, tokenBudget = 20000)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "threshold sampling must be retry-stable")
    val kept = docs.filter($"doc_id".isin(a.toSeq: _*))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("books") === 1000L, "under-budget source must keep every doc")
    assert(kept("web") > 150 && kept("web") < 350,
      s"web keep-count far off the 0.25 rate: ${kept("web")}")
    assert(DomainMix.sampleThresholds(docs, 20000).columns.toSet ===
      Set("doc_id", "source", "text"))
  }

  test("curation funnel (q87) is deterministic and ends inside the corpus") {
    val d = "/root/testdata/sf0.001"
    val run1 = TrainPrepQueries.q87.build(spark, d).collect().toSeq
    val run2 = TrainPrepQueries.q87.build(spark, d).collect().toSeq
    assert(run1 === run2, "funnel must be rerun-stable end to end")
    assert(run1.nonEmpty, "funnel must survive to the shard audit")
    val totalDocs = run1.map(_.getLong(1)).sum
    val corpus = graft.sources.Tables(spark, d, "documents").count()
    assert(totalDocs > 0 && totalDocs < corpus,
      s"funnel output $totalDocs must be a strict subset of $corpus docs")
  }
}
