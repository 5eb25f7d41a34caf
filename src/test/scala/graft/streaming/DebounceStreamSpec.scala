package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DebounceStream]] (X182) oracles: CHRONOLOGICAL slicing of the
  * sf0.001 events reproduces the batch q217 census bit-for-bit (the
  * X140 in-order contract), a bounce pair SPLIT across batches is
  * counted, a replayed batch id is a no-op, and the state survives a
  * REAL kill between state swap and checkpoint commit over X71.
  */
class DebounceStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  private lazy val ev = graft.sources.Tables.events(spark, sf0001)
    .select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"))

  test("chronological 3-batch slicing == batch q217 bit-for-bit") {
    val path = tmpDir("dbstream") + "/state"
    // chronological slices: thirds of the (ts, event_id) order
    val ordered = ev.orderBy(col("ts"), col("event_id")).collect()
    val n = ordered.length
    (0 until 3).foreach { i =>
      val slice = ordered.slice(i * n / 3, (i + 1) * n / 3)
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3)))
        .toSeq.toDF("user_id", "ts", "event_id", "event_type")
      DebounceStream.applyOnce(slice, path, i.toLong)
    }
    assert(rows(DebounceStream.read(spark, path)) ===
      rows(graft.operators.DebounceAudit.q217.build(spark, sf0001)))
  }

  test("a bounce pair split across batches is counted; replay is a " +
      "no-op") {
    val path = tmpDir("dbstream-x") + "/state"
    def mk(rs: Seq[(Long, Long, String)]) = rs.zipWithIndex
      .map { case ((u, sec, ty), i) =>
        (u, new java.sql.Timestamp(1700000000000L + sec * 1000L),
          (sec * 100 + i).toLong, ty)
      }.toDF("user_id", "ts", "event_id", "event_type")
    DebounceStream.applyOnce(mk(Seq((1L, 0L, "A"))), path, 0L)
    // 3 s after the LAST event of batch 0 — only the carried state
    // can see the gap
    DebounceStream.applyOnce(mk(Seq((1L, 3L, "A"))), path, 1L)
    val r = DebounceStream.read(spark, path).collect()(0)
    assert(r.getAs[Long]("n_events") === 2L)
    assert(r.getAs[Long]("n_bounces") === 1L,
      "cross-batch bounce must be counted")
    DebounceStream.applyOnce(mk(Seq((1L, 100L, "A"))), path, 1L)
    assert(DebounceStream.read(spark, path).collect()(0)
      .getAs[Long]("n_events") === 2L, "replay double-counted")
  }

  test("maintained census survives a REAL kill between state swap " +
      "and checkpoint commit (X71 source)") {
    val path = tmpDir("dbstream-ks") + "/state"
    val ckpt = tmpDir("dbstream-ks-ckpt")
    EmbeddedLog.createTopic("dbks", 1)
    // bursts every ~3 s with occasional 10 s gaps — mixed verdicts
    val rs = (0 until 36).map { i =>
      val sec = i * 3L + (i / 9) * 10L
      (i.toLong % 4, sec, "A")
    }
    rs.zipWithIndex.foreach { case ((u, sec, ty), i) =>
      EmbeddedLog.sendString("dbks", ty,
        s"""{"user_id":$u,"event_id":$i,"us":${1700000000000000L +
          sec * 1000000L}}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "dbks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "14")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'user_id BIGINT, event_id BIGINT, us BIGINT') AS j")
        .selectExpr("j.user_id AS user_id",
          "timestamp_micros(j.us) AS ts", "j.event_id AS event_id",
          "'A' AS event_type")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          DebounceStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("dbstream-ks-ref") + "/state"
    DebounceStream.applyOnce(
      rs.zipWithIndex.map { case ((u, sec, ty), i) =>
        (u, new java.sql.Timestamp(1700000000000L + sec * 1000L),
          i.toLong, ty)
      }.toDF("user_id", "ts", "event_id", "event_type"),
      refPath, 0L)
    assert(rows(DebounceStream.read(spark, path)) ===
      rows(DebounceStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("dbks")
  }
}
