package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[OhlcStream]] (X158) oracles: ARBITRARY (round-robin, i.e.
  * deliberately non-chronological) batch slicing reproduces the batch
  * q190 bars bit-for-bit — the commutative-merge contract, STRONGER
  * than X140's chronological one; a replayed batch id is a no-op; and
  * the maintained bars survive a REAL kill between state swap and
  * checkpoint commit over the X71 source.
  */
class OhlcStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.sources.Tables.events(spark, sf0001)
    .select(col("event_type"), col("ts"), col("event_id"), col("value"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  private def batchBars: Seq[Seq[Any]] =
    rows(graft.operators.OhlcBars.q190.build(spark, sf0001))

  test("round-robin 3-batch slicing (NOT chronological) == batch q190 " +
      "bars bit-for-bit — the merge is commutative") {
    val path = tmpDir("ohlcstream") + "/state"
    (0 until 3).foreach { i =>
      OhlcStream.applyOnce(
        ev.filter(pmod(col("event_id"), lit(3)) === i), path, i.toLong)
    }
    assert(rows(OhlcStream.read(spark, path)) === batchBars)
  }

  test("replayed batch id is a no-op; open/close picked by the " +
      "(us, event_id) total order across batches") {
    val path = tmpDir("ohlcstream-r") + "/state"
    def mk(rs: Seq[(String, Long, Long, Double)]) =
      rs.map { case (t, us, id, v) =>
        (t, new java.sql.Timestamp(us / 1000L), id, v)
      }.toDF("event_type", "ts", "event_id", "value")
    // batch 0 carries the LATER events; batch 1 delivers the true open
    val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    OhlcStream.applyOnce(mk(Seq(
      ("A", t0 + 5000000L, 10L, 7.0), ("A", t0 + 9000000L, 11L, 2.0))),
      path, 0L)
    OhlcStream.applyOnce(mk(Seq(
      ("A", t0 + 1000000L, 9L, 4.0))), path, 1L)
    val r = OhlcStream.read(spark, path).collect()(0)
    assert(r.getAs[Double]("open") === 4.0,
      "open = earliest event even though it arrived in a later batch")
    assert(r.getAs[Double]("close") === 2.0)
    assert(r.getAs[Double]("high") === 7.0 && r.getAs[Double]("low") === 2.0)
    assert(r.getAs[Long]("volume") === 3L)
    assert(r.getAs[Double]("amount") === 13.0)
    // replay: same batch id applied again changes nothing
    OhlcStream.applyOnce(mk(Seq(("A", t0 + 1000000L, 9L, 4.0))), path, 1L)
    assert(OhlcStream.read(spark, path).collect()(0)
      .getAs[Long]("volume") === 3L, "replay double-counted")
  }

  test("maintained bars survive a REAL kill between state swap and " +
      "checkpoint commit (X71 source)") {
    val path = tmpDir("ohlcstream-ks") + "/state"
    val ckpt = tmpDir("ohlcstream-ks-ckpt")
    EmbeddedLog.createTopic("ohlcks", 2)
    val rs = (0 until 40).map { i =>
      val us = 1704067200000000L + i * 600000000L // 10-min spacing
      ("A", i.toLong, us, (i % 7 + 1).toDouble)
    }
    rs.foreach { case (t, id, us, v) =>
      EmbeddedLog.sendString("ohlcks", t,
        s"""{"event_type":"$t","event_id":$id,"us":$us,"value":$v}""",
        1000L + id)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "ohlcks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "15")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'event_type STRING, event_id BIGINT, us BIGINT, " +
          "value DOUBLE') AS j")
        .selectExpr("j.event_type AS event_type",
          "timestamp_micros(j.us) AS ts",
          "j.event_id AS event_id", "j.value AS value")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          OhlcStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("ohlcstream-ks-ref") + "/state"
    OhlcStream.applyOnce(
      rs.map { case (t, id, us, v) =>
        (t, new java.sql.Timestamp(us / 1000L), id, v)
      }.toDF("event_type", "ts", "event_id", "value"), refPath, 0L)
    assert(rows(OhlcStream.read(spark, path)) ===
      rows(OhlcStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("ohlcks")
  }
}
