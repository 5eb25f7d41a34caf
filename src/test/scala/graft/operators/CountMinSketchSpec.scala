package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[CountMinSketch]] (X172) vs a literal driver CMS built from the
  * same md5-h60 hashes: the counter frame, the min-over-rows
  * estimates, and the never-undercount invariant must all reproduce
  * exactly — the sketch's randomness is pinned salts, so there is
  * nothing probabilistic left to tolerate.
  */
class CountMinSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def h60(key: Long, salt: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$key:$salt".getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def bucket(key: Long, r: Int): Int =
    (h60(key, s"cms$r") % CountMinSketch.Width).toInt

  /** Driver CMS estimate of `key` over the key multiset. */
  private def driverEst(keys: Seq[Long], key: Long): Long =
    (0 until CountMinSketch.Depth).map { r =>
      val b = bucket(key, r)
      keys.count(k => bucket(k, r) == b).toLong
    }.min

  test("planted multiset: estimates ≡ driver CMS, never under the " +
      "exact count, and the sketch frame matches the driver counters") {
    val keys = (1L to 40L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val out = CountMinSketch
      .calibrate(keys.toDF("k"), topKeys = 40).collect()
    assert(out.length === 40)
    out.foreach { r =>
      val k = r.getAs[Long]("partkey")
      val exact = keys.count(_ == k).toLong
      assert(r.getAs[Long]("exact_cnt") === exact, s"key $k")
      assert(r.getAs[Long]("cms_est") === driverEst(keys, k), s"key $k")
      assert(r.getAs[Long]("cms_est") >= exact, s"undercount at $k")
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("cms_est") - exact)
    }
    val counters = CountMinSketch.sketch(keys.toDF("k")).collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    (0 until CountMinSketch.Depth).foreach { r =>
      keys.groupBy(k => bucket(k, r)).foreach { case (b, ks) =>
        assert(counters((r, b.toLong)) === ks.size.toLong, s"cell $r/$b")
      }
    }
  }

  test("a forced collision overcounts: two keys sharing every bucket " +
      "row would be indistinguishable — verify the min actually " +
      "separates keys that differ in at least one row") {
    // Width 512, Depth 4: among 1..2000 find a pair colliding in row 0
    // but not all rows — the min must use the separating row.
    val pair = (for {
      a <- 1L to 2000L
      b <- (a + 1) to 2000L
      if bucket(a, 0) == bucket(b, 0) &&
        (1 until CountMinSketch.Depth).exists(r =>
          bucket(a, r) != bucket(b, r))
    } yield (a, b)).headOption
    assert(pair.nonEmpty, "generator sanity: some row-0 collision exists")
    val (a, b) = pair.get
    val keys = Seq.fill(100)(a) ++ Seq(b)
    val out = CountMinSketch.calibrate(keys.toDF("k"), topKeys = 2)
      .collect().map(r => r.getAs[Long]("partkey") ->
        r.getAs[Long]("cms_est")).toMap
    // b collides with a's 100 copies in row 0 (estimate 101 there) but
    // a separating row exists, so min() must bring it back to 1.
    assert(out(b) === driverEst(keys, b))
    assert(out(b) < 101L)
    assert(out(a) === 100L)
  }

  test("q211 at sf0.001: top keys by exact count, estimates ≡ driver " +
      "replay") {
    val keys = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_partkey").collect().map(_.getLong(0)).toSeq
    val got = CountMinSketch.q211.build(spark, sf0001).collect()
    assert(got.length === CountMinSketch.TopKeys)
    got.foreach { r =>
      val k = r.getAs[Long]("partkey")
      assert(r.getAs[Long]("exact_cnt") === keys.count(_ == k).toLong)
      assert(r.getAs[Long]("cms_est") === driverEst(keys, k), s"key $k")
    }
  }
}
