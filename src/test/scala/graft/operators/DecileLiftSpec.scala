package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DecileLift]] (X181) oracles: the lift identities on a planted
  * score where deciles are hand-checkable (top decile all-positive →
  * lift = N/P exactly; cum_capture reaches 1.0), and sf0.001 ≡ a
  * driver replay of the hashed-ngram score order, NTILE cut, and the
  * double-tree lift columns.
  */
class DecileLiftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Driver replica of the X63 weight-sum s over normalized text. */
  private def scoreOf(text: String): Long = {
    val norm = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    norm.split(" ", -1).map { w =>
      val asc = if (w.isEmpty) 0L else w.head.toLong
      val ascR = if (w.isEmpty) 0L else w.last.toLong
      val bucket =
        ((w.length.toLong * 17 + asc * 31 + ascR) % 4096 + 4096) % 4096
      ((bucket * 1103515245L + 12345L) % 2001 + 2001) % 2001 - 1000
    }.sum
  }

  private def ntileOf(n: Int, k: Int)(i: Int): Int = {
    val base = n / k
    val extra = n % k
    if (i < (base + 1) * extra) i / (base + 1) + 1
    else extra + (i - (base + 1) * extra) / math.max(base, 1) + 1
  }

  test("planted 20 docs, positives exactly the top 10 scores: " +
      "deciles 1-5 have lift 2 and capture climbs 0.2 ... 1.0; " +
      "deciles 6-10 have lift 0") {
    // score is monotone in doc text length here: "w" * k gives s =
    // k * weight(w...) — instead plant via lang and rely on doc_id
    // tie-break with CONSTANT text (s = weight of same word, ties →
    // doc_id order).
    val docs = (1L to 20L).map { id =>
      (id, if (id <= 10) "en" else "de", "same text every row")
    }.toDF("doc_id", "lang", "text")
    val dir = tmpDir("lift")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DecileLift.q219.build(spark, dir).collect()
    assert(out.length === 10)
    out.foreach { r =>
      val decile = r.getInt(0)
      assert(r.getLong(1) === 2L)
      val pos = r.getLong(2)
      assert(pos === (if (decile <= 5) 2L else 0L), s"decile $decile")
      assert(r.getAs[Double]("lift") ===
        (if (decile <= 5) 2.0 else 0.0), s"decile $decile")
      // 6/10 in binary double is 0.6000000000000001 under this
      // parenthesization — compare the computed tree, not the literal
      assert(r.getAs[Double]("cum_capture") ===
        math.min(decile, 5).toDouble * 2.0 / 10.0, s"decile $decile")
    }
  }

  test("q219 at sf0.001 ≡ driver replay (score order, NTILE cut, " +
      "lift trees)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ordered = docs
      .map { case (id, lang, text) => (id, lang, scoreOf(text)) }
      .sortBy { case (id, _, s) => (-s, id) }
    val n = ordered.length
    val cells = ordered.zipWithIndex.map { case ((_, lang, _), i) =>
      (ntileOf(n, DecileLift.Deciles)(i), lang == "en")
    }
    val census = cells.groupBy(_._1).map { case (d, xs) =>
      d -> ((xs.length.toLong, xs.count(_._2).toLong))
    }
    val nAll = census.values.map(_._1).sum
    val pAll = census.values.map(_._2).sum
    val got = DecileLift.q219.build(spark, sf0001).collect()
    assert(got.length === census.size)
    var cum = 0L
    got.sortBy(_.getInt(0)).foreach { r =>
      val d = r.getInt(0)
      val (cn, cp) = census(d)
      cum += cp
      assert(r.getLong(1) === cn && r.getLong(2) === cp, s"decile $d")
      assert(r.getAs[Double]("pos_rate") === cp.toDouble / cn.toDouble)
      assert(r.getAs[Double]("lift") ===
        (cp * nAll).toDouble / (cn * pAll).toDouble)
      assert(r.getAs[Double]("cum_capture") ===
        cum.toDouble / pAll.toDouble)
    }
  }
}
