package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LatenessStream]] (X140) oracles: under chronological slicing the
  * maintained counters are BIT-IDENTICAL to the batch q179 profile
  * over the same events — including a cross-batch straggler measured
  * against a high-water mark absorbed batches earlier; a replayed
  * batch id is a no-op; and the maintained form survives a REAL kill
  * between state swap and checkpoint commit over the X71 source.
  */
class LatenessStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.sources.Tables.events(spark, sf0001)
    .select(col("event_type"), col("event_id"), col("ts"))

  private def batchCounters: Seq[Seq[Any]] =
    graft.operators.LatenessAudit.q179.build(spark, sf0001)
      .select("event_type", "n", "n_late", "n_beyond_1m", "max_late_us")
      .collect().map(_.toSeq.toList).toList

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("chronological 3-batch slicing == batch q179 counters " +
      "bit-for-bit (cross-batch stragglers included)") {
    val path = tmpDir("latstream") + "/state"
    val cuts = ev.agg(min(col("event_id")), max(col("event_id")))
      .collect()(0)
    val (lo, hi) = (cuts.getAs[Number](0).longValue,
      cuts.getAs[Number](1).longValue)
    val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
    Seq(ev.filter(col("event_id") <= c1),
      ev.filter(col("event_id") > c1 && col("event_id") <= c2),
      ev.filter(col("event_id") > c2)).zipWithIndex.foreach {
      case (b, i) => LatenessStream.applyOnce(b, path, i.toLong)
    }
    assert(rows(LatenessStream.read(spark, path)) === batchCounters)
  }

  test("a planted cross-batch straggler is measured against the " +
      "state high-water mark, not just its own batch") {
    val path = tmpDir("latstream-x") + "/state"
    def mk(rs: Seq[(String, Long, Long)]) =
      rs.map { case (t, id, us) =>
        (t, id, new java.sql.Timestamp(us / 1000L))
      }.toDF("event_type", "event_id", "ts")
    // batch 0 establishes hwm = 1000s; batch 1's single event at 100s
    // is 900s late even though it is batch-1's only (thus in-batch
    // never-late) event
    LatenessStream.applyOnce(
      mk(Seq(("A", 1L, 1000000000L))), path, 0L)
    LatenessStream.applyOnce(
      mk(Seq(("A", 2L, 100000000L))), path, 1L)
    val r = LatenessStream.read(spark, path).collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Long]("n_late") === 1L)
    assert(r.getAs[Long]("max_late_us") === 900000000L)
    assert(r.getAs[Long]("n_beyond_1m") === 1L)
    // replayed batch id: no-op
    LatenessStream.applyOnce(
      mk(Seq(("A", 2L, 100000000L))), path, 1L)
    assert(LatenessStream.read(spark, path).collect()(0)
      .getAs[Long]("n") === 2L, "replay double-counted")
  }

  test("maintained lateness survives a REAL kill between state swap " +
      "and checkpoint commit (X71 source)") {
    val path = tmpDir("latstream-ks") + "/state"
    val ckpt = tmpDir("latstream-ks-ckpt")
    EmbeddedLog.createTopic("latks", 2)
    // arrival order = send order; event times zig-zag so lateness is
    // non-trivial
    val rs = (0 until 40).map { i =>
      val us = (100 + (if (i % 3 == 2) i - 2 else i) * 10) * 1000000L
      ("A", i.toLong, us)
    }
    rs.foreach { case (t, id, us) =>
      EmbeddedLog.sendString("latks", t,
        s"""{"event_type":"$t","event_id":$id,"us":$us}""", 1000L + id)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "latks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "15")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'event_type STRING, event_id BIGINT, us BIGINT') AS j")
        .selectExpr("j.event_type AS event_type",
          "j.event_id AS event_id",
          "timestamp_micros(j.us) AS ts")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          LatenessStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    // one-shot reference over the same rows in the same arrival order
    val refPath = tmpDir("latstream-ks-ref") + "/state"
    LatenessStream.applyOnce(
      rs.map { case (t, id, us) =>
        (t, id, new java.sql.Timestamp(us / 1000L))
      }.toDF("event_type", "event_id", "ts"), refPath, 0L)
    assert(rows(LatenessStream.read(spark, path)) ===
      rows(LatenessStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("latks")
  }
}
