package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Bm25]] (X82) semantic oracles on a planted corpus: term-frequency
  * saturation ranks the term-rich doc first, idf discounts a
  * corpus-wide term relative to a rare one, and the score matches an
  * independent driver recomputation of the textbook formula.
  */
class Bm25Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, String)]): String = {
    val d = tmpDir("bm25-docs")
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("src0"))
      .withColumn("n_chars", org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted ranking: the query-term-rich doc ranks first; a doc " +
      "with zero query terms never appears") {
    val filler = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = Seq(
      (1L, s"hash join window stream hash join $filler"), // rich
      (2L, s"hash $filler"),                              // one term
      (3L, s"$filler $filler"))                           // none
    val got = Bm25.q133.build(spark, dir(rows)).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
    assert(got.find(_.getAs[Int]("rank") == 1).get
      .getAs[Long]("doc_id") === 1L)
  }

  test("idf: a term present in EVERY doc scores below the same tf of " +
      "a rare term (equal lengths)") {
    // 'hash' is corpus-wide (low idf), 'stream' appears once (high idf);
    // docs 1 and 2 have identical length and tf=1 for their distinct term
    val rows = Seq(
      (1L, "hash alpha beta gamma delta"),
      (2L, "stream alpha beta gamma delta"),
      (3L, "hash epsilon zeta eta theta"),
      (4L, "hash iota kappa lambda mu"))
    val got = Bm25.q133.build(spark, dir(rows)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25_r")).toMap
    assert(got(2L) > got(1L),
      s"rare-term doc must outscore common-term doc: $got")
  }

  test("score matches the textbook formula recomputed on the driver") {
    val rows = Seq(
      (1L, "hash join hash alpha beta"),
      (2L, "window gamma delta epsilon zeta eta"),
      (3L, "stream stream theta iota"))
    val d = dir(rows)
    val got = Bm25.q133.build(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25_r")).toMap
    // driver replay
    val toks = rows.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = rows.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def score(id: Long): Double = {
      val ts = toks(id)
      Bm25.Terms.map { term =>
        val tf = ts.count(_ == term).toDouble
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(term)).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * (tf * (Bm25.K1 + 1.0)) /
            (tf + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * (ts.size / avgdl)))
        }
      }.sum
    }
    got.foreach { case (id, s) =>
      // got is rounded to 4 dp; compare against the unrounded replay
      // with the half-step tolerance
      assert(math.abs(s - score(id)) < 1e-4,
        s"bm25 mismatch for doc $id: got $s expected ${score(id)}")
    }
  }

  // ---- X111: the maintained-index form ------------------------------

  private def docsFrame =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))

  test("X111 state: merged over 4 batches == one-shot partials frame " +
      "exactly; replayed batch id is a no-op") {
    val path = tmpDir("bm25-inc") + "/state"
    (0 to 3).foreach(b => Bm25.mergeStatsOnce(
      docsFrame.filter(pmod(col("doc_id"), lit(4)) === b), path, b.toLong))
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.selectExpr("kind", "tok", "doc_id", "n").collect()
        .map(_.toString).sorted.toSeq
    assert(snap(spark.read.parquet(path)) ===
      snap(Bm25.statsPartials(docsFrame)),
      "merged state must equal the one-shot partials")
    val before = snap(spark.read.parquet(path))
    Bm25.mergeStatsOnce(docsFrame, path, 3L) // replay id
    assert(snap(spark.read.parquet(path)) === before)
  }

  test("X111 stats stay CURRENT: after an append batch, scoring " +
      "against the state equals a full recompute over the extended " +
      "corpus (df/avgdl shifts included)") {
    import spark.implicits._
    val path = tmpDir("bm25-inc2") + "/state"
    Bm25.mergeStatsOnce(docsFrame, path, 0L)
    // an append batch that uses the probe terms — df and avgdl move
    val extra = (9000L until 9040L).map(i =>
      (i, s"hash join window stream extra content number $i"))
      .toDF("doc_id", "text")
    Bm25.mergeStatsOnce(extra, path, 1L)
    val fromState = Bm25.scoreFromState(spark, path).collect()
      .map(_.toString).toSeq
    // full recompute over the extended corpus through q133's builder
    val dir = tmpDir("bm25-ext")
    docsFrame.select(col("doc_id"), col("text"))
      .unionByName(extra)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val recompute = Bm25.q133.build(spark, dir).collect()
      .map(_.toString).toSeq
    assert(fromState === recompute,
      "maintained index must be indistinguishable from the rescan")
  }
}
