package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[OverlapQueries]] (X72–X74) semantic oracles on a hand-built corpus
  * (the cross-engine hash gate runs via the q123–q125 DuckDB oracles;
  * here we pin the CLAIMS: containment catches small-in-big pairs the
  * symmetric gate misses, the edit verifier is the exact DP, stitching
  * finds exactly the planted boundary pairs).
  */
class OverlapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Write a documents.parquet with the given (id, text) rows into a
    * fresh dir shaped like the testdata tables, so the GraftQuery
    * builders run unmodified against it.
    */
  private def corpusDir(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("overlap-corpus")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q123: full containment of a small doc in a big one is found " +
      "where the symmetric jaccard 0.5 gate misses it") {
    val small = (1 to 16).map(i => s"w$i").mkString(" ")
    val big = small + " " + (17 to 50).map(i => s"w$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, small), (2L, big),
      (3L, (100 to 130).map(i => s"z$i").mkString(" "))))
    val got = OverlapQueries.q123.build(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) === (1L, 2L))
    assert(r.getAs[Double]("cont_a_in_b") === 1.0) // all of A's shingles in B
    // the symmetric gate would have missed it: J = 14/48 < 0.5
    val j = DedupQueries.bruteJaccardPairs(
      MinHashDedup.shingles(spark.read.parquet(s"$dir/documents.parquet")),
      0.5).collect()
    assert(j.isEmpty, "q42's symmetric 0.5 gate must miss this pair")
  }

  test("q124: exact DP distance and micro-unit similarity on a known edit") {
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    // one token substituted mid-doc: "w15" -> "xx" (3 chars vs 2)
    val b = a.replace(" w15 ", " xx ")
    val dir = corpusDir(Seq((1L, a), (2L, b)))
    val got = OverlapQueries.q124.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(got.contains((1L, 2L)))
    val r = got((1L, 2L))
    // levenshtein("w15","xx") inside otherwise identical strings = 3
    // (2 substitutions + 1 deletion)
    assert(r.getAs[Int]("lev") === 3)
    val maxlen = r.getAs[Int]("maxlen")
    val expectMicro = (2000000L * (maxlen - 3) + maxlen) / (2L * maxlen)
    assert(r.getAs[Double]("edit_sim") === expectMicro / 1000000.0d)
  }

  test("q125: exactly the planted boundary pairs, found by digest join") {
    val texts = Seq(
      (1L, (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 24).map(i => s"b$i").mkString(" ")),
      (3L, "too short to qualify"))
    val dir = corpusDir(texts)
    val got = OverlapQueries.q125.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every eligible doc (>= 16 words) pairs with its planted twin on
    // the md5 of its last 8 normalized words; doc 3 is ineligible
    val expect = Seq(1L, 2L).map { id =>
      val ws = texts.find(_._1 == id).get._2.split(" ")
      val tail = ws.takeRight(8).mkString(" ")
      (id, id + 1000000L,
        java.security.MessageDigest.getInstance("MD5")
          .digest(tail.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }
    assert(got.toSet === expect.toSet,
      s"expected exactly the planted stitches: got ${got.toSeq}")
    // scale claim: the pair face is a digest equi-join, not a product
    val plan = OverlapQueries.q125.build(spark, dir)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"stitch join must be an equi-join:\n${plan.take(2000)}")
  }
}
