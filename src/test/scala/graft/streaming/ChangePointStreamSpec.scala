package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ChangePointStream]] (X165) oracles: ARBITRARY (round-robin)
  * slicing of the sf0.001 events reproduces the batch q184 census
  * bit-for-bit (hourly sums commute — the strong X98/X158 contract),
  * a level shift SPLIT ACROSS batches still localizes to the right
  * hour, a replayed batch id is a no-op, and the maintained state
  * survives a REAL kill between swap and checkpoint commit over X71.
  */
class ChangePointStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.sources.Tables.events(spark, sf0001)
    .select(col("event_type"), col("ts"), col("event_id"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("round-robin 3-batch slicing == batch q184 census bit-for-bit") {
    val path = tmpDir("cpstream") + "/state"
    (0 until 3).foreach { i =>
      ChangePointStream.applyOnce(
        ev.filter(pmod(col("event_id"), lit(3)) === i), path, i.toLong)
    }
    assert(rows(ChangePointStream.read(spark, path)) ===
      rows(graft.operators.ChangePoint.q184.build(spark, sf0001)))
  }

  test("a level shift split across batches localizes to the last " +
      "pre-shift hour; replayed batch id is a no-op") {
    val path = tmpDir("cpstream-x") + "/state"
    def mk(rs: Seq[(Int, Int)]) = // (hour, count)
      rs.flatMap { case (h, c) =>
        (0 until c).map(i =>
          ("A", java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:01"),
            (h * 1000 + i).toLong))
      }.toDF("event_type", "ts", "event_id")
    // rate 2 for hours 0-3, rate 6 for hours 4-7 — but each batch
    // carries only HALF of every hour's events, so no single batch
    // sees the true series
    val full = Seq(0, 1, 2, 3).map((_, 2)) ++ Seq(4, 5, 6, 7).map((_, 6))
    ChangePointStream.applyOnce(
      mk(full.map { case (h, c) => (h, c / 2) }), path, 0L)
    ChangePointStream.applyOnce(
      mk(full.map { case (h, c) => (h, c - c / 2) }), path, 1L)
    val r = ChangePointStream.read(spark, path).collect()(0)
    assert(r.getAs[Long]("n_hours") === 8L)
    assert(r.getAs[Long]("n_events") === 32L)
    assert(r.getAs[java.sql.Timestamp]("change_hour") ===
      java.sql.Timestamp.valueOf("2024-01-01 03:00:00"),
      "ML change location = last pre-shift hour")
    // replay is a no-op
    ChangePointStream.applyOnce(
      mk(Seq((0, 5))), path, 1L)
    assert(ChangePointStream.read(spark, path).collect()(0)
      .getAs[Long]("n_events") === 32L, "replay double-counted")
  }

  test("maintained census survives a REAL kill between state swap " +
      "and checkpoint commit (X71 source)") {
    val path = tmpDir("cpstream-ks") + "/state"
    val ckpt = tmpDir("cpstream-ks-ckpt")
    EmbeddedLog.createTopic("cpks", 2)
    val rs = (0 until 40).map { i =>
      val hour = i / 5
      ("A", i.toLong, 1704067200000000L + hour * 3600000000L + i * 1000L)
    }
    rs.foreach { case (t, id, us) =>
      EmbeddedLog.sendString("cpks", t,
        s"""{"event_type":"$t","event_id":$id,"us":$us}""", 1000L + id)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "cpks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "15")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'event_type STRING, event_id BIGINT, us BIGINT') AS j")
        .selectExpr("j.event_type AS event_type",
          "timestamp_micros(j.us) AS ts", "j.event_id AS event_id")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          ChangePointStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("cpstream-ks-ref") + "/state"
    ChangePointStream.applyOnce(
      rs.map { case (t, id, us) =>
        (t, new java.sql.Timestamp(us / 1000L), id)
      }.toDF("event_type", "ts", "event_id"), refPath, 0L)
    assert(rows(ChangePointStream.read(spark, path)) ===
      rows(ChangePointStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("cpks")
  }
}
