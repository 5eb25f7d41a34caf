package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[VocabDrift]] (X103) oracles on planted corpora: H² = 0 exactly
  * for identical distributions, H² = 1 exactly for disjoint
  * vocabularies, a planted boilerplate flood moves H² by a visible
  * margin, and the statistic equals a driver-side recomputation.
  */
class VocabDriftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): (Long, Long, Long, Double,
      Double) = {
    val dir = tmpDir("vdrift")
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = VocabDrift.q151.build(spark, dir).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4))
  }

  test("identical distributions on both sides give H^2 = 0 exactly") {
    // doc 2i and 2i+1 carry the same text → the %2 split is identical
    val docs = (0 until 100).flatMap { i =>
      val text = s"alpha beta gamma tok${i % 10}"
      Seq((2L * i, text), (2L * i + 1, text))
    }
    val (_, _, shared, bc, h2) = run(docs)
    assert(shared === 13L) // alpha beta gamma + 10 toki
    assert(bc === 1.0 && h2 === 0.0)
  }

  test("disjoint vocabularies give H^2 = 1 exactly") {
    val docs = (0 until 100).map { i =>
      (i.toLong, if (i % 2 == 0) s"even${i % 7} evenly" else s"odd${i % 7} oddly")
    }
    val (_, _, shared, bc, h2) = run(docs)
    assert(shared === 0L)
    assert(bc === 0.0 && h2 === 1.0)
  }

  test("a planted boilerplate flood on one side moves H^2; statistic " +
      "equals the driver-side recomputation") {
    val base = (0 until 200).map(i =>
      (i.toLong, s"common word tok${i % 23} here"))
    // flood the even side with a boilerplate token
    val flooded = base.map { case (id, t) =>
      (id, if (id % 2 == 0) t + " cookiebanner cookiebanner cookiebanner"
      else t)
    }
    val (_, _, _, _, h2Null) = run(base)
    val (na, nb, _, bcF, h2Flood) = run(flooded)
    // the %2 split of tok${i%23} is close but not identical (even ids
    // hit different residues than odd) — small but nonzero
    assert(h2Null < 0.01, s"null corpus should be ~0, got $h2Null")
    assert(h2Flood > h2Null + 0.05,
      s"flood must move the statistic: $h2Null -> $h2Flood")
    // driver recomputation
    val cnt = scala.collection.mutable.Map
      .empty[(Long, String), Long].withDefaultValue(0L)
    flooded.foreach { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).foreach(w => cnt((id % 2, w)) += 1)
    }
    val aTok = cnt.collect { case ((0L, w), c) => w -> c }.toMap
    val bTok = cnt.collect { case ((1L, w), c) => w -> c }.toMap
    val prods = aTok.keySet.intersect(bTok.keySet).toSeq
      .map(w => aTok(w) * bTok(w)).sorted
    val bcDriver = prods.foldLeft(0.0d)((acc, p) => acc + math.sqrt(p.toDouble)) /
      (math.sqrt(aTok.values.sum.toDouble) * math.sqrt(bTok.values.sum.toDouble))
    assert(na === aTok.values.sum && nb === bTok.values.sum)
    assert(bcF === math.rint(bcDriver * 1e6) / 1e6,
      s"bc $bcF vs driver $bcDriver")
  }
}
