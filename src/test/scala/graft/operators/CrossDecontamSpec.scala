package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[CrossDecontam]] (X84) semantic oracles: a planted paraphrase-style
  * eval contamination (high shingle overlap, no long verbatim run) is
  * caught with the exactly-expected Jaccard, clean pairs stay silent,
  * pairs never form within one split, and the join is keyed (no
  * cartesian).
  */
class CrossDecontamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, String)]): String = {
    val d = tmpDir("decontam-docs")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted paraphrase contamination is flagged with the exact " +
      "expected Jaccard; clean docs stay silent") {
    // train doc 1 (id%10!=0) vs eval doc 10 (id%10==0): eval swaps ONE
    // word mid-document — shingle sets overlap heavily but share no
    // verbatim run longer than the prefix/suffix
    val words = (1 to 20).map(i => s"w$i")
    val train = words.mkString(" ")                       // 18 shingles
    val evalC = words.updated(9, "XX").mkString(" ")      // swaps w10
    val clean = (1 to 20).map(i => s"z$i").mkString(" ")
    val got = CrossDecontam.q135.build(spark,
      dir(Seq((1L, train), (10L, evalC), (3L, clean), (20L, clean
        .replace("z1 ", "y1 "))))).collect()
    // shingles: 18 each; eval changes 3 shingles (positions 8,9,10) →
    // inter = 15, union = 18+18-15 = 21 → J = 15/21 = 0.7143
    val hits = got.filter(r => r.getAs[Long]("train_doc") == 1L &&
      r.getAs[Long]("eval_doc") == 10L)
    assert(hits.length === 1, s"expected the planted pair, got " +
      got.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(hits(0).getAs[Long]("n_inter") === 15L)
    assert(math.abs(hits(0).getAs[Double]("jaccard") - 15.0 / 21.0) < 1e-3)
    // the clean near-pair (3, 20) is train×train+eval-side? doc 3 and 20:
    // 3 is train, 20 is eval, they differ by one word too — but they're
    // z-vocabulary; they ARE a cross-split near-dup pair by construction,
    // so they MUST be flagged as well (the operator reports all pairs)
    assert(got.exists(r => r.getAs[Long]("train_doc") == 3L &&
      r.getAs[Long]("eval_doc") == 20L))
    // but no (1, 20) or (3, 10) cross-vocabulary pair
    assert(!got.exists(r => r.getAs[Long]("train_doc") == 1L &&
      r.getAs[Long]("eval_doc") == 20L))
  }

  test("pairs never form within one split (train×train and eval×eval " +
      "are out of scope by construction)") {
    val rows = CrossDecontam.q135.build(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("train_doc") % 10 !== 0L)
      assert(r.getAs[Long]("eval_doc") % 10 === 0L)
    }
  }

  test("plan gate: shingle equi-join, no CartesianProduct, nothing " +
      "corpus-sized broadcast") {
    val plan = CrossDecontam.q135.build(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.toLowerCase.contains("broadcastnestedloop"))
  }
}
