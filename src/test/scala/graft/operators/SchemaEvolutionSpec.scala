package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SchemaEvolution]] (X142) oracles: the merged read carries the
  * grown column with NULLs exactly on the pre-evolution batch (not
  * dropped, not misaligned), and q182's null accounting matches a
  * direct computation from the source table.
  */
class SchemaEvolutionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("mergeSchema read: grown column present, NULL exactly on the " +
      "v1 batch rows") {
    val dir = tmpDir("evo") + "/feed"
    Seq((2L, "en", 10L), (4L, "de", 20L))
      .toDF("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    Seq((1L, "en", 30L, "web"), (3L, "en", 40L, "books"))
      .toDF("doc_id", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("source"))
    val bySrc = merged.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("source"))).toMap
    assert(bySrc(2L).isEmpty && bySrc(4L).isEmpty,
      "v1 rows must surface the grown column as NULL")
    assert(bySrc(1L) === Some("web") && bySrc(3L) === Some("books"))
  }

  test("fixture invariant: the generator emits zero null sources " +
      "(the batch-partition accounting does not ride on this, but a " +
      "regen that broke it should fail HERE, not as a faraway q182 " +
      "hash mismatch)") {
    Seq(sf0001).foreach { d =>
      val nNull = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("source").isNull).count()
      assert(nNull === 0L, s"null sources appeared in $d")
    }
  }

  test("q182 at sf0.001 == direct computation from the source table") {
    val got = SchemaEvolution.q182.build(spark, sf0001).collect()
    val direct = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L))
          .as("n_pre_evolution"),
        countDistinct(when(col("doc_id") % 2 === 1, col("source")))
          .as("n_sources"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang")).collect()
    assert(got.map(_.toSeq.toList).toList ===
      direct.map(_.toSeq.toList).toList)
    assert(got.map(_.getAs[Long]("n_pre_evolution")).sum > 0)
  }
}
