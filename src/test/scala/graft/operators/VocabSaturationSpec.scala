package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[VocabSaturation]] (X171) oracles: the min-shard trick credits a
  * token type exactly once at its FIRST shard, a shard introducing
  * nothing new reports 0 (not a dropped row), the final cumulative
  * count is the corpus vocabulary, and sf0.001 ≡ a driver replay.
  */
class VocabSaturationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Long, Long)] =
    VocabSaturation.curve(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("first-shard credit: a token in shards 0 and 3 counts as new " +
      "only at 0; shard 3 with nothing new reports 0") {
    // shard = doc_id % 10
    val out = run(Seq(
      (0L, "alpha beta"), // shard 0: alpha, beta new
      (3L, "alpha"), //       shard 3: nothing new
      (13L, "alpha  alpha"))) // shard 3 again; double space → empty tok
    assert(out === Seq(
      (0L, 1L, 2L, 2L, 2L, 2L),
      (3L, 2L, 3L, 0L, 2L, 5L)))
  }

  test("cumulative curve ends at the corpus vocabulary and " +
      "cum_tokens at the corpus token count") {
    val docs = (0L until 40L)
      .map(i => (i, s"w${i % 7} w${i % 3} common"))
    val out = run(docs)
    val vocab = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
    assert(out.last._5 === vocab.distinct.size.toLong)
    assert(out.last._6 === vocab.size.toLong)
    assert(out.map(_._4).sum === vocab.distinct.size.toLong)
  }

  test("q210 at sf0.001 ≡ driver replay (per-shard marginals and the " +
      "min-shard new-type census)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id % 10, id, t))
    }
    val newTypes = toks.groupBy(_._3).values
      .map(_.map(_._1).min)
      .groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    val marg = toks.groupBy(_._1).map { case (s, v) =>
      s -> ((v.map(_._2).distinct.size.toLong, v.size.toLong))
    }
    val got = VocabSaturation.q210.build(spark, sf0001).collect()
    var cumT = 0L
    var cumK = 0L
    got.foreach { r =>
      val s = r.getLong(0)
      val (nd, nt) = marg(s)
      assert(r.getLong(1) === nd, s"n_docs shard $s")
      assert(r.getLong(2) === nt, s"n_tokens shard $s")
      assert(r.getLong(3) === newTypes.getOrElse(s, 0L), s"new shard $s")
      cumT += r.getLong(3); cumK += r.getLong(2)
      assert(r.getLong(4) === cumT && r.getLong(5) === cumK, s"cum $s")
    }
  }
}
