package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Every registered query must build, run at sf0.001, and (where the
  * result is not legitimately tiny) return rows. Deep value checks are the
  * driver's DuckDB gate; this keeps `sbt test` honest about the full
  * surface.
  */
class QueriesSmokeSpec extends SparkSpec {

  // pair-similarity queries can legitimately return zero rows on the
  // near-orthogonal synthetic corpus
  private val mayBeEmpty = Set("q42_ngram_jaccard_pairs",
    "q43_minhash_lsh_pairs", "q44_simhash_pairs",
    "q71_dedup_against_corpus", "q72b_probe")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, build) =>
    test(s"$name runs at sf0.001") {
      val df = build(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
