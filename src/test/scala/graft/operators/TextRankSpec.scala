package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TextRank]] (X77) semantic oracles (the cross-engine hash gate is
  * q128's DuckDB oracle): a planted hub word out-ranks the periphery,
  * the result is partitioning-independent (integer arithmetic claim),
  * and the edge frame is the symmetric weighted adjacency.
  */
class TextRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("textrank-corpus")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a planted hub adjacent to every other word ranks first") {
    // star graph: hub-x1 hub-x2 ... — hub co-occurs with all, xi only
    // with hub
    val dir = corpusDir(Seq(
      (1L, (1 to 12).map(i => s"hub x$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"hub x$i").mkString(" "))))
    val top = TextRank.q128.build(spark, dir).collect()
    assert(top.head.getAs[String]("word") === "hub")
    // hub's score strictly dominates any leaf
    val hubScore = top.head.getAs[Long]("score_mu")
    assert(top.tail.forall(_.getAs[Long]("score_mu") < hubScore))
  }

  test("edges are symmetric with adjacency counts") {
    val dir = corpusDir(Seq((1L, "a b a b c")))
    val e = TextRank.edges(spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // adjacencies: a-b, b-a, a-b, b-c → cnt(a,b)=3 both directions
    assert(e(("a", "b")) === 3L && e(("b", "a")) === 3L)
    assert(e(("b", "c")) === 1L && e(("c", "b")) === 1L)
    assert(!e.contains(("a", "c")))
  }

  test("scores are independent of input partitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir1 = tmpDir("tr-p1"); val dir8 = tmpDir("tr-p8")
    docs.repartition(1).write.parquet(s"$dir1/documents.parquet")
    docs.repartition(8).write.parquet(s"$dir8/documents.parquet")
    val a = TextRank.q128.build(spark, dir1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val b = TextRank.q128.build(spark, dir8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq)
  }
}
