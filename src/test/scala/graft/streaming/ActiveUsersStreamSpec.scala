package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ActiveUsersStream]] (X192) oracles: ARBITRARY (round-robin)
  * slicing — including a duplicate user-day delivered in TWO batches
  * — reproduces batch q227 bit-for-bit (set union commutes and
  * absorbs, the strongest contract in the maintenance tier), replay
  * is a no-op, and the ledger survives a REAL kill between state
  * swap and checkpoint commit over X71.
  */
class ActiveUsersStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("round-robin 3-batch slicing == batch q227 bit-for-bit") {
    val path = tmpDir("austream") + "/state"
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"))
    (0 until 3).foreach { i =>
      ActiveUsersStream.applyOnce(
        ev.filter(pmod(col("event_id"), lit(3)) === i), path, i.toLong)
    }
    assert(rows(ActiveUsersStream.read(spark, path)) ===
      rows(graft.operators.ActiveUsers.q227.build(spark, sf0001)))
  }

  test("a user-day arriving in TWO batches counts once (absorbing " +
      "merge); replay is a no-op") {
    val path = tmpDir("austream-x") + "/state"
    def mk(rs: Seq[(Long, Int)]) = rs.zipWithIndex
      .map { case ((u, d), i) =>
        (u, new java.sql.Timestamp(1704067200000L +
          d.toLong * 86400000L + i * 1000L), (d * 100 + i).toLong)
      }.toDF("user_id", "ts", "event_id")
    ActiveUsersStream.applyOnce(mk(Seq((1L, 0), (2L, 0))), path, 0L)
    ActiveUsersStream.applyOnce(mk(Seq((1L, 0), (1L, 1))), path, 1L)
    val out = ActiveUsersStream.read(spark, path).collect()
    assert(out(0).getAs[Long]("dau") === 2L, "day 0: users {1,2} once")
    assert(out(1).getAs[Long]("dau") === 1L)
    assert(out(1).getAs[Long]("wau") === 2L)
    ActiveUsersStream.applyOnce(mk(Seq((9L, 5))), path, 1L)
    assert(ActiveUsersStream.read(spark, path).collect().length === 2,
      "replay added a day")
  }

  test("ledger survives a REAL kill between state swap and " +
      "checkpoint commit (X71 source)") {
    val path = tmpDir("austream-ks") + "/state"
    val ckpt = tmpDir("austream-ks-ckpt")
    EmbeddedLog.createTopic("auks", 1)
    val rs = (0 until 30).map { i =>
      (i.toLong % 5, 1704067200000000L + (i % 7).toLong * 86400000000L)
    }
    rs.zipWithIndex.foreach { case ((u, us), i) =>
      EmbeddedLog.sendString("auks", "e",
        s"""{"user_id":$u,"us":$us}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "auks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "12")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'user_id BIGINT, us BIGINT') AS j")
        .selectExpr("j.user_id AS user_id",
          "timestamp_micros(j.us) AS ts")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          ActiveUsersStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("austream-ks-ref") + "/state"
    ActiveUsersStream.applyOnce(
      rs.map { case (u, us) =>
        (u, new java.sql.Timestamp(us / 1000L))
      }.toDF("user_id", "ts"), refPath, 0L)
    assert(rows(ActiveUsersStream.read(spark, path)) ===
      rows(ActiveUsersStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("auks")
  }

  test("HLL tier: round-robin slicing == one-shot sketch state " +
      "(register max commutes/absorbs); estimates within the " +
      "documented eps of exact q227") {
    val sliced = tmpDir("austream-hll") + "/state"
    val oneShot = tmpDir("austream-hll1") + "/state"
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"))
    (0 until 3).foreach { i =>
      ActiveUsersStream.Hll.applyOnce(
        ev.filter(pmod(col("event_id"), lit(3)) === i), sliced, i.toLong)
    }
    ActiveUsersStream.Hll.applyOnce(ev, oneShot, 0L)
    val got = rows(ActiveUsersStream.Hll.read(spark, sliced))
    assert(got === rows(ActiveUsersStream.Hll.read(spark, oneShot)),
      "slicing must not change the merged registers' estimates")
    // accuracy vs the exact tier: RSE ~1.6% at lgK=12; 4 sigma bound
    val exact = graft.operators.ActiveUsers.q227.build(spark, sf0001)
      .collect().map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val (dau, wau, mau) = exact(r.head.asInstanceOf[java.sql.Timestamp])
      def ok(est: Any, ex: Long) =
        math.abs(est.asInstanceOf[Long] - ex) <= math.max(1.0, 0.065 * ex)
      assert(ok(r(1), dau) && ok(r(2), wau) && ok(r(3), mau),
        s"estimates $r drifted beyond 6.5% of exact ($dau,$wau,$mau)")
    }
  }

  test("HLL tier: a user-day in TWO batches is absorbed; replay is " +
      "a no-op") {
    val path = tmpDir("austream-hllx") + "/state"
    def mk(rs: Seq[(Long, Int)]) = rs.zipWithIndex
      .map { case ((u, d), i) =>
        (u, new java.sql.Timestamp(1704067200000L +
          d.toLong * 86400000L + i * 1000L))
      }.toDF("user_id", "ts")
    ActiveUsersStream.Hll.applyOnce(mk(Seq((1L, 0), (2L, 0))), path, 0L)
    ActiveUsersStream.Hll.applyOnce(mk(Seq((1L, 0), (1L, 1))), path, 1L)
    val out = ActiveUsersStream.Hll.read(spark, path).collect()
    assert(out(0).getAs[Long]("dau") === 2L,
      "day 0: users {1,2}, the re-sent user 1 absorbed by register max")
    assert(out(1).getAs[Long]("dau") === 1L)
    assert(out(1).getAs[Long]("wau") === 2L)
    ActiveUsersStream.Hll.applyOnce(mk(Seq((9L, 5))), path, 1L)
    assert(ActiveUsersStream.Hll.read(spark, path).collect().length === 2,
      "replay added a day")
  }
}
