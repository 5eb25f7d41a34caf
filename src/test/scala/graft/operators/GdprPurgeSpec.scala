package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[GdprPurge]] (X141) oracles: a planted table with known request
  * membership purges exactly the requested users' rows, the physical
  * read-back agrees with the arithmetic, and the proof column is zero
  * — on the planted table and the real sf0.001 feed.
  */
class GdprPurgeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("planted table: exact purge accounting, physical read-back, " +
      "zero requested rows remaining") {
    val dir = tmpDir("gdpr")
    // users 13 and 26 are in the request set (% 13 == 0); 0 is too
    val rows = Seq(
      (13L, 1L, "view", 1.0, "p"), (13L, 2L, "view", 1.0, "p"),
      (26L, 3L, "purchase", 2.0, "p"),
      (1L, 4L, "view", 1.0, "p"), (2L, 5L, "view", 1.0, "p"),
      (14L, 6L, "view", 1.0, "p"))
    rows.map { case (u, id, t, v, p) =>
      (u, new java.sql.Timestamp(id * 1000L), id, t, v, p)
    }.toDF("user_id", "ts", "event_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = GdprPurge.q181.build(spark, dir).collect()(0)
    assert(r.getAs[Long]("rows_before") === 6L)
    assert(r.getAs[Long]("rows_purged") === 3L)
    assert(r.getAs[Long]("rows_after") === 3L)
    assert(r.getAs[Long]("rows_after_physical") === 3L,
      "the rewritten table must physically hold exactly the survivors")
    assert(r.getAs[Long]("requested_remaining") === 0L)
    assert(r.getAs[Long]("n_users_requested") === 2L)
  }

  test("sf0.001: physical read-back == arithmetic, proof column zero") {
    val r = GdprPurge.q181.build(spark, sf0001).collect()(0)
    assert(r.getAs[Long]("rows_after") ===
      r.getAs[Long]("rows_after_physical"))
    assert(r.getAs[Long]("requested_remaining") === 0L)
    assert(r.getAs[Long]("rows_purged") > 0L,
      "the deterministic request set must be non-empty on real data")
  }
}
