package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ShardRebalance]] (X156) oracles: a literal driver replay of the
  * HRW argmax and mod placements at sf0.001, the HRW minimality
  * invariant (the ONLY keys that move are those the new shard wins —
  * the theorem the operator exists to surface), and the mod/HRW move
  * ordering.
  */
class ShardRebalanceSpec extends AnyFunSuite with SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def hrw(key: Long, n: Int): Int =
    (0 until n).maxBy(s => (h60(s"$key:$s"), -s))

  test("q197 at sf0.001 == driver replay; HRW moves EXACTLY the keys " +
      "the new shard wins; mod moves more than HRW") {
    val keys = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val n = keys.length.toLong
    val hrwNew = keys.map(k => hrw(k, ShardRebalance.NewShards))
    val hrwMoved = keys.zip(hrwNew).count { case (k, nw) =>
      hrw(k, ShardRebalance.OldShards) != nw
    }.toLong
    val wonByNew = hrwNew.count(_ == ShardRebalance.OldShards).toLong
    assert(hrwMoved === wonByNew,
      "HRW minimality: a key moves iff the grown shard wins it")
    val modNew = keys.map(k => h60(s"$k:0") % ShardRebalance.NewShards)
    val modMoved = keys.map(k => h60(s"$k:0")).zip(modNew).count {
      case (h, nw) => h % ShardRebalance.OldShards != nw
    }.toLong
    def loads(xs: Seq[Long]): (Long, Long) = {
      val m = xs.groupBy(identity).view.mapValues(_.size.toLong)
      (m.values.max, m.values.min)
    }
    val (hMax, hMin) = loads(hrwNew.map(_.toLong).toSeq)
    val (mMax, mMin) = loads(modNew.toSeq)
    val got = ShardRebalance.q197.build(spark, sf0001).collect().map { r =>
      r.getAs[String]("strategy") -> ((r.getAs[Long]("n_keys"),
        r.getAs[Long]("moved"), r.getAs[Long]("move_micro"),
        r.getAs[Long]("new_max_load"), r.getAs[Long]("new_min_load")))
    }.toMap
    assert(got("hrw") === ((n, hrwMoved, hrwMoved * 1000000L / n,
      hMax, hMin)))
    assert(got("mod") === ((n, modMoved, modMoved * 1000000L / n,
      mMax, mMin)))
    assert(hrwMoved < modMoved,
      "the audit's point: rendezvous placement moves a ~1/9 sliver, " +
        "mod placement rewrites ~8/9 of the corpus")
  }
}
