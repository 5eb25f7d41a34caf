package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MannKendallStream]] (X204) oracles: DAY-COMPLETE chronological
  * slicing of the sf0.001 events reproduces batch q237 bit-for-bit
  * (the histogram ΔS identity), a cross-batch pair is counted once,
  * replay is a no-op, and the state survives a REAL kill between
  * state swap and checkpoint commit over X71.
  */
class MannKendallStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("day-complete chronological 3-batch slicing == batch q237 " +
      "bit-for-bit") {
    val path = tmpDir("mkstream") + "/state"
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("ts"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
          .cast("long").as("day"))
    val days = ev.select(col("day")).distinct()
      .orderBy(col("day")).collect().map(_.getLong(0))
    val cuts = Seq(days(days.length / 3), days(2 * days.length / 3))
    val slices = Seq(
      ev.filter(col("day") < cuts(0)),
      ev.filter(col("day") >= cuts(0) && col("day") < cuts(1)),
      ev.filter(col("day") >= cuts(1)))
    slices.zipWithIndex.foreach { case (sl, i) =>
      MannKendallStream.applyOnce(
        sl.select(col("event_type"), col("ts")), path, i.toLong)
    }
    assert(rows(MannKendallStream.read(spark, path)) ===
      rows(graft.operators.MannKendall.q237.build(spark, sf0001)))
  }

  test("a pair spanning two batches is counted via the histogram; " +
      "replay is a no-op") {
    val path = tmpDir("mkstream-x") + "/state"
    def mk(rs: Seq[(Int, Int)]) = rs.zipWithIndex.flatMap {
      case ((day, c), i) => (0 until c).map { j =>
        ("A", new java.sql.Timestamp(
          java.sql.Timestamp.valueOf("2024-01-01 06:00:00").getTime +
            day.toLong * 86400000L + (i * 100 + j) * 1000L))
      }
    }.toDF("event_type", "ts")
    // batch 0: days 0,1 with counts 1,2; batch 1: day 2 with count 3
    MannKendallStream.applyOnce(mk(Seq((0, 1), (1, 2))), path, 0L)
    MannKendallStream.applyOnce(mk(Seq((2, 3))), path, 1L)
    val r = MannKendallStream.read(spark, path).collect()(0)
    assert(r.getLong(1) === 3L, "three days")
    assert(r.getLong(2) === 3L,
      "strictly increasing: S = C(3,2) = 3, two pairs cross batches")
    MannKendallStream.applyOnce(mk(Seq((3, 9))), path, 1L)
    assert(MannKendallStream.read(spark, path).collect()(0)
      .getLong(1) === 3L, "replay added a day")
  }

  test("trend state survives a REAL kill between state swap and " +
      "checkpoint commit (X71 source)") {
    val path = tmpDir("mkstream-ks") + "/state"
    val ckpt = tmpDir("mkstream-ks-ckpt")
    EmbeddedLog.createTopic("mkks", 1)
    // 8 days alternating 3/7 records — every consecutive day PAIR
    // sums to 10, so trigger cap 10 slices exactly two whole days per
    // batch (day-complete by construction) while daily counts vary
    val rs = (0 until 8).flatMap { d =>
      (0 until (if (d % 2 == 0) 3 else 7)).map(j => (d, j))
    }
    rs.zipWithIndex.foreach { case ((d, off), i) =>
      EmbeddedLog.sendString("mkks", "e",
        s"""{"epd":${19723 + d},"off":$off}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "mkks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "10")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'epd BIGINT, off BIGINT') AS j")
        .selectExpr("'A' AS event_type",
          "timestamp_seconds(j.epd * 86400 + j.off * 60) AS ts")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          MannKendallStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("mkstream-ks-ref") + "/state"
    MannKendallStream.applyOnce(
      rs.map { case (d, off) =>
        ("A", new java.sql.Timestamp(
          (19723L + d) * 86400000L + off * 60000L))
      }.toDF("event_type", "ts"), refPath, 0L)
    assert(rows(MannKendallStream.read(spark, path)) ===
      rows(MannKendallStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("mkks")
  }
}
