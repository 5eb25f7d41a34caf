package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DriftMonitor]] (X89) oracles: an on-distribution window reports
  * cosine ≈ 1 and no drift, a planted distribution shift trips the
  * flag, the centroid cosine matches a driver replay, and windows
  * only emit once closed by the watermark (append-mode contract).
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vec(axis: Int, mag: Double = 1.0): Array[Double] = {
    val v = new Array[Double](dim); v(axis) = mag; v
  }

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  test("planted shift: on-distribution window passes, shifted window " +
      "drifts, cosine matches a driver replay") {
    val ref = vec(0)
    val input = MemoryStream[(Timestamp, Long, Array[Double])](spark)
    val q = DriftMonitor.monitor(
      input.toDF().toDF("ts", "vec_id", "embedding"), ref,
      window = "1 minute", watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("drift")
      .start()
    try {
      // minute 0: all vectors near the reference axis (slight tilt)
      input.addData(
        (ts(0, 5), 1L, vec(0)),
        (ts(0, 20), 2L, { val v = vec(0); v(1) = 0.1; v }),
        (ts(0, 40), 3L, { val v = vec(0); v(1) = -0.1; v }))
      q.processAllAvailable()
      // minute 1: the distribution jumps to axis 2 — drifted
      input.addData(
        (ts(1, 10), 4L, vec(2)),
        (ts(1, 30), 5L, { val v = vec(2); v(0) = 0.2; v }))
      q.processAllAvailable()
      // nothing should have EMITTED yet: both windows are still open
      assert(spark.table("drift").count() === 0L,
        "append mode must hold windows until the watermark closes them")
      // minute 5 advances the watermark past both windows
      input.addData((ts(5, 0), 9L, vec(0)))
      q.processAllAvailable()
      val rows = spark.table("drift")
        .selectExpr("cast(window_start as string)", "n_vecs",
          "centroid_cos_r", "drifted")
        .as[(String, Long, Double, Boolean)].collect()
        .sortBy(_._1)
      assert(rows.length === 2)
      val Array(w0, w1) = rows
      assert(w0._2 === 3L)
      // centroid of minute 0 = (3, 0, ...) /3 → cos vs e0 = 1.0 exactly
      // (the ±0.1 tilts cancel)
      assert(math.abs(w0._3 - 1.0) < 1e-6)
      assert(!w0._4)
      assert(w1._2 === 2L)
      // centroid of minute 1 = (0.2, 0, 2)/2 → cos = 0.2/sqrt(4.04)
      val expect = 0.2 / math.sqrt(0.2 * 0.2 + 2.0 * 2.0)
      assert(math.abs(w1._3 - expect) < 1e-6,
        s"cos ${w1._3} vs replay $expect")
      assert(w1._4, "shifted window must trip the drift flag")
    } finally q.stop()
  }
}
