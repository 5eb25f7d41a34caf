package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[CurationAudit]] (X93) semantic oracles: one planted doc per drop
  * reason carries exactly its expected bit (plus documented
  * co-occurrences), a clean doc keeps with mask 0, and kept ⟺
  * mask = 0 corpus-wide.
  */
class CurationAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, String)]): String = {
    val d = tmpDir("audit-docs")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted reasons land their exact bits; a clean doc keeps") {
    val clean = "the quick brown fox of the meadow is happy to run and " +
      "jump over the lazy dog while the sun is high and the wind is " +
      "soft over the field and the day is long"        // en, 36 words
    val short = "too short to keep"                     // 4 words
    val pii = clean.replace("happy", "reachable at bob@example.com")
    val spanish = "el gato y los perros de una casa es bonito cuando " +
      "las luces de una ciudad es grande y los campos de una granja " +
      "es verde y el cielo es azul sobre las casas"
    val repeat = Array.fill(30)("spam").mkString(" ")
    val got = CurationAudit.q143.build(spark, dir(Seq(
      (1L, clean), (2L, short), (3L, pii), (4L, spanish), (5L, repeat))))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(got(1L).getAs[Long]("reasons_mask") === 0L)
    assert(got(1L).getAs[Boolean]("kept"))
    // short: bit 0, and 4 words also fails the length-saturating
    // quality formula (bit 1) — a documented co-occurrence
    assert(got(2L).getAs[Boolean]("r_short"))
    assert(got(2L).getAs[Long]("reasons_mask") === 3L)
    // pii: exactly bit 2 (still English, long, non-repetitive)
    assert(got(3L).getAs[Long]("reasons_mask") === 4L,
      s"pii doc mask ${got(3L).getAs[Long]("reasons_mask")}")
    // spanish: exactly bit 3
    assert(got(4L).getAs[Long]("reasons_mask") === 8L,
      s"spanish doc mask ${got(4L).getAs[Long]("reasons_mask")}")
    // repeat: bit 4, plus non-English (no markers) bit 3
    assert(got(5L).getAs[Boolean]("r_repeat"))
    assert((got(5L).getAs[Long]("reasons_mask") & 16L) === 16L)
    assert(!got(5L).getAs[Boolean]("kept"))
  }

  test("corpus-wide: kept <=> mask 0, and the mask always equals the " +
      "OR of its bit columns") {
    val rows = CurationAudit.q143.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mask = r.getAs[Long]("reasons_mask")
      assert(r.getAs[Boolean]("kept") === (mask == 0L))
      val bits = Seq("r_short", "r_quality", "r_pii", "r_lang", "r_repeat")
        .zipWithIndex.map { case (c, i) =>
          if (r.getAs[Boolean](c)) 1L << i else 0L
        }.sum
      assert(bits === mask)
    }
  }
}
