package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[CompactionPlanner]] (X153) oracles: a planted manifest that walks
  * every binning case — exact-fit boundary, a straddling file kept in
  * the bin of its START offset, an oversize file flagged, independent
  * sources — plus the sf0.001 manifest ≡ a literal driver replay of
  * the offset arithmetic.
  */
class CompactionPlannerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T = CompactionPlanner.TargetBytes

  private def run(rows: Seq[(Long, String, Long)])
      : Map[(String, Long), (Long, Long, Long, Long, Long, Long)] = {
    val dir = tmpDir("compact")
    rows.toDF("doc_id", "source", "n_chars")
      .selectExpr("doc_id", "'x' as text", "'en' as lang", "source",
        "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    CompactionPlanner.q194.build(spark, dir).collect().map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("bytes"),
          r.getAs[Long]("first_file"), r.getAs[Long]("last_file"),
          r.getAs[Long]("n_oversize"), r.getAs[Long]("fill_micro")))
    }.toMap
  }

  test("offset binning: exact fill closes a bin, a straddler stays in " +
      "its start bin, an oversize file is flagged, sources independent") {
    val rows = Seq(
      // source a: two files exactly fill bin 0; the third starts at
      // offset T → bin 1; the fourth (oversize, 2T) starts inside
      // bin 1 (offset T + 100) and stays there, flagged
      (1L, "a", T / 2), (2L, "a", T / 2), (3L, "a", 100L),
      (4L, "a", 2 * T),
      // source b: one small file → its own bin 0
      (10L, "b", 10L))
    val out = run(rows)
    assert(out(("a", 0L)) === ((2L, T, 1L, 2L, 0L, 1000000L)))
    assert(out(("a", 1L)) ===
      ((2L, 100L + 2 * T, 3L, 4L, 1L, (100L + 2 * T) * 1000000L / T)))
    assert(out(("b", 0L)) === ((1L, 10L, 10L, 10L, 0L, 10L * 1000000L / T)))
    assert(out.size === 3)
  }

  test("q194 at sf0.001 == literal driver replay") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).flatMap { case (src, rows) =>
      var off = 0L
      rows.sortBy(_._2).map { case (_, id, b) =>
        val bin = off / T; off += b; (src, bin, id, b)
      }.groupBy(_._2).map { case (bin, fs) =>
        (src, bin) -> ((fs.length.toLong, fs.map(_._4).sum,
          fs.map(_._3).min, fs.map(_._3).max,
          fs.count(_._4 > T).toLong, fs.map(_._4).sum * 1000000L / T))
      }
    }.toMap
    val got = CompactionPlanner.q194.build(spark, sf0001).collect().map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("bytes"),
          r.getAs[Long]("first_file"), r.getAs[Long]("last_file"),
          r.getAs[Long]("n_oversize"), r.getAs[Long]("fill_micro")))
    }.toMap
    assert(got === expected)
  }
}
