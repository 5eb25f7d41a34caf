package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TokenBurstiness]] (X205) oracles: a planted corpus separates
  * the bursty content token from the spread function token by hand
  * values, the top-k total order is pinned, and q239 at sf0.001 ≡ a
  * driver replay of the whole census.
  */
class TokenBurstinessSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[String]): Seq[(Int, String, Long, Long,
      Long, Double, Double)] = {
    val dir = tmpDir("burst")
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' as lang", "'web' as source",
        "CAST(length(text) AS BIGINT) as n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TokenBurstiness.q239.build(spark, dir).collect().map { r =>
      (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))
    }.toSeq
  }

  test("planted corpus: the repeated-within-one-doc token is bursty, " +
      "the everywhere-once token is not") {
    val out = run(Seq(
      "the spark spark spark engine",
      "the quiet engine",
      "the other engine"))
    val byTok = out.map(r => r._2 -> r).toMap
    // 'the': cf=3, df=3, b=1.0, coverage 1.0
    assert(byTok("the")._3 === 3L && byTok("the")._4 === 3L)
    assert(byTok("the")._6 === 1.0 && byTok("the")._7 === 1.0)
    // 'spark': cf=3, df=1, b=3.0, max_in_doc=3, coverage 1/3
    assert(byTok("spark")._3 === 3L && byTok("spark")._4 === 1L)
    assert(byTok("spark")._5 === 3L && byTok("spark")._6 === 3.0)
    // rank order: cf desc then token — engine/spark/the all cf=3
    assert(out.take(3).map(_._2) === Seq("engine", "spark", "the"))
  }

  test("q239 at sf0.001 == driver replay of the head census") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity).toSeq
        .map { case (tok, g) => (tok, id, g.length.toLong) }
    }
    val vocab = perDoc.groupBy(_._1).toSeq.map { case (tok, xs) =>
      (tok, xs.map(_._3).sum, xs.length.toLong, xs.map(_._3).max)
    }
    val n = docs.length.toLong
    val expected = vocab
      .sortBy { case (tok, cf, _, _) => (-cf, tok) }
      .take(TokenBurstiness.TopTokens)
      .zipWithIndex
      .map { case ((tok, cf, df, mx), i) =>
        (i + 1, tok, cf, df, mx, cf.toDouble / df.toDouble,
          df.toDouble / n.toDouble)
      }
    val got = TokenBurstiness.q239.build(spark, sf0001).collect()
      .map { r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))
      }.toSeq
    assert(got === expected && got.nonEmpty)
  }
}
