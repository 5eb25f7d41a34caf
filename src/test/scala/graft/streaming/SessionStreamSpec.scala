package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[StreamingAggregates.sessionizeStream]] parity oracle (r16,
  * VERDICT r15 item 6 — the X123/X140 pattern applied to the one
  * streaming aggregate that lacked a streamed≡batch proof): the
  * sf0.001 events fed CHRONOLOGICALLY through the X71 embedded log in
  * sliced micro-batches, with a REAL kill+restart mid-stream, emit
  * exactly batch q35's sessions — same starts, ends (+gap, Spark's
  * session_window convention), counts, and decimal-exact value sums.
  */
class SessionStreamSpec extends AnyFunSuite with SparkSpec {

  test("streaming session_window == batch q35 bit-for-bit under " +
      "chronological slicing with a real kill+restart (X71)") {
    // ---- feed: all sf0.001 events in ts order through ONE partition
    // (chronological arrival — the in-order contract that makes the
    // watermark drop nothing), values carried as exact cents
    val ev = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._2, r._1))
    // boundary pin: q35 splits on gap STRICTLY > 30 min while Spark's
    // session_window starts a new session at exactly end+gap (touching
    // windows don't merge) — the two differ only on a gap of EXACTLY
    // 30 min, which this corpus must not contain for the parity claim
    // to be exact (the ADVICE-r15 discipline: assert the assumption,
    // don't ride on it)
    ev.groupBy(_._3).values.foreach { rows =>
      rows.map(_._2).toSeq.sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b - a != 1800000000L,
          "an exactly-30-min gap would split the two formulations")
        case _ =>
      }
    }
    EmbeddedLog.createTopic("sess", 1)
    ev.foreach { case (id, us, user, cents) =>
      EmbeddedLog.sendString("sess", user.toString,
        s"""{"event_id":$id,"us":$us,"user_id":$user,"cents":$cents}""",
        1000L + id)
    }
    // sentinel far past every session end: pushes the final watermark
    // beyond end+gap of every real session so append mode emits them
    // all; its own (unfinalized) session is filtered below
    val flushUs = ev.map(_._2).max + 100L * 86400L * 1000000L
    EmbeddedLog.sendString("sess", "-1",
      s"""{"event_id":-1,"us":$flushUs,"user_id":-1,"cents":0}""",
      999999999L)

    // ---- streaming run: sliced micro-batches, kill after batch 1
    val ckpt = tmpDir("sess-ckpt")
    val out = new java.util.concurrent.ConcurrentHashMap[
      (Long, java.sql.Timestamp),
      (java.sql.Timestamp, Long, Double)]()
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "sess").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "300")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'event_id BIGINT, us BIGINT, user_id BIGINT, cents BIGINT') AS j")
        .selectExpr("j.user_id AS user_id",
          "timestamp_micros(j.us) AS ts",
          "CAST(j.cents AS DOUBLE) / 100.0 AS value")
        .transform(StreamingAggregates.sessionizeStream(_))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          // keyed puts: a replayed batch after the kill overwrites
          // identically instead of double-counting
          b.collect().foreach { r =>
            out.put((r.getAs[Long]("user_id"),
              r.getAs[java.sql.Timestamp]("session_start")),
              (r.getAs[java.sql.Timestamp]("session_end"),
                r.getAs[Long]("n_events"),
                r.getAs[Double]("session_value")))
          }
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill mid-stream")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    EmbeddedLog.dropTopic("sess")

    // ---- batch oracle: q35 sessions, end shifted by the gap
    import scala.jdk.CollectionConverters._
    val got = out.asScala.filter(_._1._1 >= 0).map { case (k, v) =>
      (k._1, k._2, v._1, v._2, v._3)
    }.toSet
    val expected = graft.operators.SessionQueries.q35
      .build(spark, sf0001)
      .select(col("user_id"), col("session_start"),
        (col("session_end") + expr("INTERVAL 30 MINUTES"))
          .as("session_end"),
        col("n_events"), col("session_value"))
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("session_value")))
      .toSet
    assert(got.size === expected.size,
      s"session count: streamed ${got.size} vs batch ${expected.size}")
    assert(got === expected)
  }
}
