package graft.operators

import graft.SparkSpec

/** [[TrainPrepQueries.q96]] on a PLANTED corpus that exercises every
  * disposition branch — the sf fixtures happen to contain no exact
  * fingerprint duplicates, so the 'duplicate' arm would otherwise ride
  * along untested.
  */
class CurationProvenanceSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: String, n: Int): String =
    (1 to n).map(i => s"$seed$i").mkString(" ")

  test("every disposition branch fires on a planted corpus") {
    // doc 0 (id % 7 == 0) is the EVAL doc; its first 8 normalized words
    // are shared verbatim by train doc 3 → contaminated.
    val evalText = "alpha beta gamma delta epsilon zeta eta theta " +
      words("pad", 12)
    val contaminated = "alpha beta gamma delta epsilon zeta eta theta " +
      words("own", 12)
    val dupText = words("dup", 20)
    val docs = Seq(
      (0L, evalText, "en", "src", evalText.length.toLong),
      (1L, words("keep", 20), "en", "src", 100L),   // kept
      (2L, "too short", "en", "src", 9L),            // gated
      (3L, contaminated, "en", "src", 100L),         // contaminated
      (4L, dupText, "en", "src", 100L),              // kept (min of pair)
      (5L, dupText, "en", "src", 100L),              // duplicate
      (6L, words("other", 20), "en", "src", 100L))   // kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("prov-corpus")
    docs.write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val got = TrainPrepQueries.q96.build(spark, dir)
      .as[(Long, String)].collect().toMap
    val expected = Map(
      1L -> "kept", 2L -> "gated", 3L -> "contaminated",
      4L -> "kept", 5L -> "duplicate", 6L -> "kept")
    assert(got === expected, s"dispositions diverged: $got")

    // conservation: the kept set must be exactly q87's input to the
    // shard audit (same stages, same decisions)
    val shardTotal = TrainPrepQueries.q87.build(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_docs"))
      .as[Long].head()
    assert(shardTotal === expected.values.count(_ == "kept"),
      "q87's shard audit must count exactly the provenance-kept docs")
  }
}
