package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[RankFusion]] (X132) oracles: the RRF score is the literal
  * three-term 1/(k+r) sum over hand-checkable planted ranks; the
  * fusion's signature property — a document consistently mid-list
  * beats one that is top-1 on a single list and deep on the rest —
  * and the full q174 at sf0.001 matches a driver-side replay.
  */
class RankFusionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = RankFusion.K

  test("consistency beats a single spike: mid-on-all outranks " +
      "top-1-on-one (the Cormack et al. property)") {
    // ranks (1-based) on three lists; k=60
    val spiky = 1.0 / (K + 1) + 1.0 / (K + 9) + 1.0 / (K + 9)
    val steady = 1.0 / (K + 3) + 1.0 / (K + 3) + 1.0 / (K + 3)
    assert(steady > spiky)
  }

  test("q174 at sf0.001 == driver-side replay: signals, ranks, and " +
      "the exact fused score") {
    val got = RankFusion.q174.build(spark, sf0001).collect()
    assert(got.length === RankFusion.TopDocs)

    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text",
        "trim(regexp_replace(regexp_replace(lower(text), " +
          "'[^a-z0-9 ]', ' '), ' +', ' ')) AS norm")
      .collect()
      .map { r =>
        val (id, text, norm) = (r.getLong(0), r.getString(1),
          r.getString(2))
        val nWords = norm.split(" ", -1).length
        val wordLen = norm.replace(" ", "").length.toDouble / nWords
        val alpha = text.count(c =>
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toDouble /
          text.length
        (id, nWords, wordLen, alpha)
      }
    def ranks[T](key: ((Long, Int, Double, Double)) => Double)
        : Map[Long, Int] =
      docs.sortBy(d => (-key(d), d._1)).zipWithIndex
        .map { case (d, i) => d._1 -> (i + 1) }.toMap
    val (r1, r2, r3) = (ranks(_._2.toDouble), ranks(_._3), ranks(_._4))
    val expected = docs.map { case (id, nWords, _, _) =>
      val score = (1.0 / (K + r1(id)) + 1.0 / (K + r2(id))) +
        1.0 / (K + r3(id))
      (id, nWords, r1(id), r2(id), r3(id), score)
    }.sortBy(d => (-d._6, d._1)).take(RankFusion.TopDocs)

    got.zip(expected).foreach { case (row, (id, nw, a, b, c, score)) =>
      assert(row.getAs[Long]("doc_id") === id)
      assert(row.getAs[Int]("n_words") === nw)
      assert(row.getAs[Int]("r_words") === a)
      assert(row.getAs[Int]("r_wordlen") === b)
      assert(row.getAs[Int]("r_alpha") === c)
      assert(math.abs(row.getAs[Double]("rrf_score") - score) < 1e-15)
    }
  }
}
