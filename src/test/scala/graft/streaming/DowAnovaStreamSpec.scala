package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DowAnovaStream]] (X207) oracles: ARBITRARY (non-chronological)
  * day-complete slicing reproduces batch q238 bit-for-bit (sums
  * commute — the strong maintenance contract), replay is a no-op,
  * and the cells survive a REAL kill between state swap and
  * checkpoint commit over X71.
  */
class DowAnovaStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("arbitrary (day mod 3) slicing == batch q238 bit-for-bit — " +
      "no chronology required") {
    val path = tmpDir("dastream") + "/state"
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("ts"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
          .cast("long").as("day"))
    // slice by day residue — batches interleave in time
    (0 until 3).foreach { i =>
      DowAnovaStream.applyOnce(
        ev.filter(pmod(col("day"), lit(3)) === i)
          .select(col("event_type"), col("ts")), path, i.toLong)
    }
    assert(rows(DowAnovaStream.read(spark, path)) ===
      rows(graft.operators.DowAnova.q238.build(spark, sf0001)))
  }

  test("replayed batch id is a no-op") {
    val path = tmpDir("dastream-x") + "/state"
    def mk(days: Seq[(Int, Int)]) = days.flatMap { case (d, c) =>
      (0 until c).map(j => ("A", new java.sql.Timestamp(
        (19723L + d) * 86400000L + j * 60000L)))
    }.toDF("event_type", "ts")
    DowAnovaStream.applyOnce(mk(Seq((0, 2), (1, 3))), path, 0L)
    val before = rows(DowAnovaStream.read(spark, path))
    DowAnovaStream.applyOnce(mk(Seq((2, 9))), path, 0L)
    assert(rows(DowAnovaStream.read(spark, path)) === before,
      "replay must not add days")
    assert(before.head(1) === 2L, "two days folded")
  }

  test("cells survive a REAL kill between state swap and checkpoint " +
      "commit (X71 source)") {
    val path = tmpDir("dastream-ks") + "/state"
    val ckpt = tmpDir("dastream-ks-ckpt")
    EmbeddedLog.createTopic("daks", 1)
    // 10 days alternating 4/6 records — consecutive day pairs sum to
    // 10, so trigger cap 10 keeps batches day-complete
    val rs = (0 until 10).flatMap { d =>
      (0 until (if (d % 2 == 0) 4 else 6)).map(j => (d, j))
    }
    rs.zipWithIndex.foreach { case ((d, off), i) =>
      EmbeddedLog.sendString("daks", "e",
        s"""{"epd":${19723 + d},"off":$off}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "daks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "10")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'epd BIGINT, off BIGINT') AS j")
        .selectExpr("'A' AS event_type",
          "timestamp_seconds(j.epd * 86400 + j.off * 60) AS ts")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          DowAnovaStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("dastream-ks-ref") + "/state"
    DowAnovaStream.applyOnce(
      rs.map { case (d, off) =>
        ("A", new java.sql.Timestamp(
          (19723L + d) * 86400000L + off * 60000L))
      }.toDF("event_type", "ts"), refPath, 0L)
    assert(rows(DowAnovaStream.read(spark, path)) ===
      rows(DowAnovaStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("daks")
  }
}
