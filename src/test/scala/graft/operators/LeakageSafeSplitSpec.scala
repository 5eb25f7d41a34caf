package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LeakageSafeSplit]] (X66): the property a per-doc hash cannot give —
  * near-dup clusters NEVER straddle splits — plus the negative control
  * showing the per-doc hash really would leak on the same fixture.
  */
class LeakageSafeSplitSpec extends AnyFunSuite with SparkSpec {

  private val lcg: Long => Long = k => (k * 1103515245L + 12345L) % 97L

  /** Pairs chosen so each cluster's members hash to DIFFERENT splits
    * under a per-doc LCG — the leakage a doc-level split would commit.
    */
  private def leakyPairs: Seq[(Long, Long)] = {
    val byBucket = (0L to 2000L).groupBy(id =>
      if (lcg(id) < 78) "train" else if (lcg(id) < 88) "val" else "test")
    val t = byBucket("train"); val v = byBucket("val"); val e = byBucket("test")
    Seq(t(0) -> v(0), v(1) -> e(0), t(1) -> e(1), e(2) -> t(2))
  }

  test("clustered docs co-split; the per-doc hash would have straddled") {
    val s = spark
    import s.implicits._
    val pairs = leakyPairs.toDF("doc_a", "doc_b")
    val ids = leakyPairs.flatMap(p => Seq(p._1, p._2)).distinct
    val docs = (ids ++ Seq(5000L, 5001L)) // plus unclustered singletons
      .map(id => (id, s"text $id")).toDF("doc_id", "text")

    val out = LeakageSafeSplit.assign(docs, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    // negative control: each planted pair DOES span hash buckets per-doc
    leakyPairs.foreach { case (a, b) =>
      def bucket(id: Long) =
        if (lcg(id) < 78) "train" else if (lcg(id) < 88) "val" else "test"
      assert(bucket(a) !== bucket(b),
        s"fixture broken: $a,$b per-doc buckets coincide")
      // the cluster hash puts them together anyway
      assert(out(a)._2 === out(b)._2, s"pair ($a,$b) straddles splits")
      assert(out(a)._1 === out(b)._1, "pair must share a group key")
    }
    // singletons hash by their own id
    Seq(5000L, 5001L).foreach { id =>
      assert(out(id)._1 === id)
      val expect =
        if (lcg(id) < 78) "train" else if (lcg(id) < 88) "val" else "test"
      assert(out(id)._2 === expect)
    }
  }

  test("transitive chains co-split even when endpoints never paired") {
    val s = spark
    import s.implicits._
    // 1-2, 2-3: cluster {1,2,3}; canonical = 1 keys the hash for all
    val docs = Seq(1L, 2L, 3L).map(id => (id, s"t$id")).toDF("doc_id", "text")
    val pairs = Seq(1L -> 2L, 2L -> 3L).toDF("doc_a", "doc_b")
    val out = LeakageSafeSplit.assign(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.map(_._2).toSet === Set(1L))
    assert(out.map(_._3).toSet.size === 1)
  }

  test("q117 report: fractions near 80/10/10 and straddle audit is zero") {
    val res = DedupQueries.q117.build(spark, sf0001).collect()
    val bySplit = res.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit.values.forall(_._3 === 0L), "straddled_groups must be 0")
    val total = bySplit.values.map(_._1).sum.toDouble
    val trainFrac = bySplit("train")._1 / total
    assert(trainFrac > 0.7 && trainFrac < 0.9,
      f"train fraction $trainFrac%.3f far from 78/97")
  }
}
