package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[CharEntropy]] (X83) semantic oracles: a repeated-char doc scores
  * entropy 0 (too_uniform), a max-diversity doc scores ln(L)
  * (too_random once the alphabet is big enough), a normal doc passes
  * both gates, and the entropy is partitioning-independent (the
  * sorted-fold determinism claim).
  */
class CharEntropySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, String)]): String = {
    val d = tmpDir("entropy-docs")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted tails: all-same-char → H=0 too_uniform; 128 distinct " +
      "chars → H=ln(128)>4.5 too_random; normal text passes") {
    val uniform = "a" * 200
    // 128 distinct unicode chars, each once → H = ln(128) ≈ 4.852
    val random = (0 until 128).map(i => ('a' + 0 + i + 0x100).toChar).mkString
    val normal = "the quick brown fox jumps over the lazy dog again and again"
    val got = CharEntropy.q134.build(spark,
      dir(Seq((1L, uniform), (2L, random), (3L, normal)))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Double]("entropy_r") === 0.0)
    assert(got(1L).getAs[Boolean]("too_uniform"))
    assert(!got(1L).getAs[Boolean]("too_random"))
    val h2 = got(2L).getAs[Double]("entropy_r")
    assert(math.abs(h2 - math.log(128.0)) < 1e-6, s"expected ln(128), got $h2")
    assert(got(2L).getAs[Boolean]("too_random"))
    assert(!got(3L).getAs[Boolean]("too_uniform"))
    assert(!got(3L).getAs[Boolean]("too_random"))
    assert(got(3L).getAs[Int]("n_distinct_chars") > 10)
  }

  test("entropy matches a driver replay of H = ln(L) - sum(n ln n)/L " +
      "on sf0.001") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = CharEntropy.q134.build(spark, sf0001).collect()
    assert(got.length === docs.size)
    got.take(50).foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val counts = text.groupBy(identity).values.map(_.length.toDouble)
      val len = text.length.toDouble
      val h = math.log(len) - counts.map(n => n * math.log(n)).sum / len
      assert(math.abs(r.getAs[Double]("entropy_r") - h) < 1e-5,
        s"entropy mismatch for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("entropy is partitioning-independent (sorted fold, no " +
      "accumulation-order dependence)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val d1 = tmpDir("ent-p1"); val d8 = tmpDir("ent-p8")
    docs.repartition(1).write.parquet(s"$d1/documents.parquet")
    docs.repartition(8).write.parquet(s"$d8/documents.parquet")
    val a = CharEntropy.q134.build(spark, d1).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    val b = CharEntropy.q134.build(spark, d8).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(a.toSeq === b.toSeq)
  }
}
