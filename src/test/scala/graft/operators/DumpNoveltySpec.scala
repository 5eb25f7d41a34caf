package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DumpNovelty]] (X78) semantic oracles: a replayed dump scores
  * novelty 0, a disjoint dump scores 1, the first dump is always fully
  * novel, and the cumulative curve is the running sum of novel counts.
  */
class DumpNoveltySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir("novelty-corpus")
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("replayed dump → novelty 0; disjoint dump → novelty 1; " +
      "cumulative curve is the running sum") {
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val c = (1 to 20).map(i => s"c$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, a, "src0"),  // dump 0: 18 shingles, all novel
      (2L, a, "src1"),  // dump 1: exact replay → 0 novel
      (3L, c, "src2"))) // dump 2: disjoint → all novel
    val rows = DumpNovelty.q129.build(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    val Seq(d0, d1, d2) = rows.toSeq
    assert(d0.getAs[Long]("n_total") === 18L)
    assert(d0.getAs[Double]("novelty_ratio") === 1.0)
    assert(d1.getAs[Long]("n_novel") === 0L)
    assert(d1.getAs[Double]("novelty_ratio") === 0.0)
    assert(d2.getAs[Double]("novelty_ratio") === 1.0)
    assert(rows.map(_.getAs[Long]("cum_distinct")).toSeq ===
      Seq(18L, 18L, 36L))
  }

  test("a source violating the 'srcN' contract fails fast instead of " +
      "silently corrupting first-seen attribution") {
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, a, "src0"),
      (2L, a, "crawl-2024"))) // no numeric suffix at position 4
    val e = intercept[Exception] {
      DumpNovelty.q129.build(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("srcN")),
      s"expected the srcN contract error, got: ${msgs(e).mkString(" | ")}")
  }
}
