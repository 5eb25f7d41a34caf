package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  final case class ShapedFrame(camera_id: String, vehicle_type: String,
      count: Int, frame_time: Timestamp)

  test("watermarked tumbling window: late data beyond watermark is dropped") {
    val input = MemoryStream[ShapedFrame](spark)
    val q = StreamingAggregates
      .vehicleTrend(input.toDF(), watermark = "2 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("trend")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    input.addData(
      ShapedFrame("CAM_1", "car", 2, ts(0, 10)),
      ShapedFrame("CAM_1", "car", 3, ts(0, 40)),
      ShapedFrame("CAM_2", "bus", 1, ts(1, 5)))
    q.processAllAvailable()
    // advance watermark far past minute 0-1 so those windows close
    input.addData(ShapedFrame("CAM_1", "car", 1, ts(10, 0)))
    q.processAllAvailable()
    // this arrives 10 min late — beyond the 2-min watermark → dropped
    input.addData(ShapedFrame("CAM_1", "car", 99, ts(0, 50)))
    q.processAllAvailable()
    input.addData(ShapedFrame("CAM_1", "car", 1, ts(20, 0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("trend")
      .selectExpr("cast(bucket_start as string)", "vehicle_type", "total", "n_frames")
      .as[(String, String, Long, Long)].collect().toSet
    assert(rows.contains(("2024-01-01 10:00:00", "car", 5L, 2L)),
      s"minute-0 car window wrong: $rows")
    assert(rows.contains(("2024-01-01 10:01:00", "bus", 1L, 1L)))
    assert(!rows.exists { case (_, _, total, _) => total >= 99 },
      "late row must have been dropped by the watermark")
  }

  test("late-row quarantine count: a planted late batch surfaces in " +
      "numRowsDroppedByWatermark via QueryMonitor (lateness audit)") {
    val monitor = new QueryMonitor().attach(spark)
    val input = MemoryStream[ShapedFrame](spark)
    val q = StreamingAggregates
      .vehicleTrend(input.toDF(), watermark = "2 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("trend_lateaudit")
      .start()
    try {
      input.addData(ShapedFrame("CAM_1", "car", 2, ts(0, 10)))
      q.processAllAvailable()
      // advance the watermark far past minute 0
      input.addData(ShapedFrame("CAM_1", "car", 1, ts(10, 0)))
      q.processAllAvailable()
      // plant TWO late rows behind the watermark: dropped AND counted —
      // the audit face; silently-vanishing late data is the failure mode
      input.addData(
        ShapedFrame("CAM_1", "car", 99, ts(0, 50)),
        ShapedFrame("CAM_2", "bus", 98, ts(0, 55)))
      q.processAllAvailable()
      q.stop()
      val mine = monitor.batches.filter(_.queryName == "trend_lateaudit")
      assert(mine.map(_.droppedByWatermark).sum === 2L,
        s"expected exactly the 2 planted late rows quarantined, got " +
          s"${mine.map(b => b.batchId -> b.droppedByWatermark)}")
    } finally {
      monitor.detach(spark)
      if (q.isActive) q.stop()
    }
  }

  test("session windows close after the gap") {
    val input = MemoryStream[ShapedFrame](spark)
    val q = StreamingAggregates
      .cameraSessions(input.toDF(), gap = "30 seconds", watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .start()
    // two bursts 10:00:00-10:00:20 and 10:02:00, gap > 30s splits them
    input.addData(
      ShapedFrame("CAM_1", "car", 1, ts(0, 0)),
      ShapedFrame("CAM_1", "car", 2, ts(0, 20)),
      ShapedFrame("CAM_1", "bus", 4, ts(2, 0)))
    q.processAllAvailable()
    input.addData(ShapedFrame("CAM_1", "car", 1, ts(30, 0))) // advance watermark
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions")
      .selectExpr("cast(session_start as string)", "cast(session_end as string)",
        "camera_id", "total", "n_frames")
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(rows.contains(
      ("2024-01-01 10:00:00", "2024-01-01 10:00:50", "CAM_1", 3L, 2L)),
      s"first session wrong: $rows")
    assert(rows.exists(r => r._1 == "2024-01-01 10:02:00" && r._4 == 4L))
  }

  final case class Alert(alert_camera: String, alert: String,
      alert_time: Timestamp)

  final case class Msg(id: String, ts: Timestamp, body: String)

  test("streaming dedup within watermark drops replayed keys") {
    val input = MemoryStream[Msg](spark)
    val q = StreamingAggregates
      .dedupStream(input.toDF(), Seq("id"), "ts", watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped")
      .start()
    input.addData(
      Msg("a", ts(0, 0), "first"),
      Msg("a", ts(0, 30), "dup-same-batch"),
      Msg("b", ts(1, 0), "other"))
    q.processAllAvailable()
    input.addData(Msg("a", ts(2, 0), "dup-next-batch"))
    q.processAllAvailable()
    q.stop()

    val bodies = spark.table("deduped")
      .selectExpr("body").as[String].collect().toSet
    assert(bodies === Set("first", "other"),
      s"replays of id 'a' within the watermark must be dropped: $bodies")
  }

  test("stream-stream interval join: frames pick up in-window alerts only") {
    val frames = MemoryStream[ShapedFrame](spark)
    val alerts = MemoryStream[Alert](spark)
    val q = StreamingAggregates
      .frameAlertJoin(frames.toDF(), alerts.toDF(), lookback = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched")
      .start()

    alerts.addData(
      Alert("CAM_1", "speeding", ts(0, 30)),  // 30s before the frame: in
      Alert("CAM_1", "stale", ts(0, 0)),      // 70s before: out of window
      Alert("CAM_2", "other-cam", ts(1, 0)))  // wrong camera
    frames.addData(ShapedFrame("CAM_1", "car", 2, ts(1, 10)))
    q.processAllAvailable()
    // advance both watermarks so buffered state can be expired
    alerts.addData(Alert("CAM_9", "tick", ts(30, 0)))
    frames.addData(ShapedFrame("CAM_9", "car", 1, ts(30, 0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("enriched")
      .selectExpr("camera_id", "alert", "cast(frame_time as string)")
      .as[(String, String, String)].collect().toSet
    assert(rows.contains(("CAM_1", "speeding", "2024-01-01 10:01:10")),
      s"in-window alert must join: $rows")
    assert(!rows.exists(_._2 == "stale"),
      s"alert outside the lookback must not join: $rows")
    assert(!rows.exists(_._2 == "other-cam"),
      s"alert from another camera must not join: $rows")
  }

  test("flatMapGroupsWithState: per-camera running totals across batches") {
    import StreamingAggregates._
    val input = MemoryStream[CameraEvent](spark)
    val q = runningCameraTotals(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("running")
      .start()
    input.addData(CameraEvent("CAM_1", 2), CameraEvent("CAM_1", 3),
      CameraEvent("CAM_2", 5))
    q.processAllAvailable()
    input.addData(CameraEvent("CAM_1", 10))
    q.processAllAvailable()
    q.stop()

    val totals = spark.table("running")
      .as[CameraRunning].collect()
      .groupBy(_.camera_id).view.mapValues(_.maxBy(_.n_frames)).toMap
    assert(totals("CAM_1").total_vehicles === 15L)
    assert(totals("CAM_1").n_frames === 3L)
    assert(totals("CAM_2").total_vehicles === 5L)
  }
}
