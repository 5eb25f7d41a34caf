package graft.streaming

import java.util.Base64

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VehiclePipelineSpec extends SparkSpec {
  import spark.implicits._

  private def frameJson(cam: String, ts: Double, payload: Array[Byte]): String = {
    val b64 = Base64.getEncoder.encodeToString(payload)
    s"""{"camera_id": "$cam", "timestamp": $ts, "frame_data": "$b64"}"""
  }

  test("frame parse + mock detect + timestamp shaping (S10-S23)") {
    val fixed = new java.sql.Timestamp(1761884470000L)
    val raw = Seq(
      frameJson("CAM_1", 1761884464.47, Array[Byte](1, 2, 3, 4)),
      frameJson("CAM_2", 1761884465.99, Array[Byte](9, 9, 9)))
      .toDF("value")
    val out = VehiclePipeline.transformAll(raw, Some(fixed)).orderBy("camera_id")
    val rows = out.collect()
    assert(rows.length === 2)
    assert(out.columns.toSeq ===
      Seq("camera_id", "vehicle_type", "count", "frame_time", "processed_at"))

    // S18: frame_time truncated to whole seconds (reference from_unixtime)
    val ft1 = rows(0).getAs[java.sql.Timestamp]("frame_time")
    assert(ft1.getTime === 1761884464000L, "sub-second must be truncated")

    // detection is deterministic: same payload → same result
    val again = VehiclePipeline.transformAll(raw, Some(fixed)).orderBy("camera_id").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)

    // vehicle_type list length matches count; classes from the kept set
    rows.foreach { r =>
      val n = r.getAs[Int]("count")
      val types = r.getAs[String]("vehicle_type")
      if (n == 0) assert(types === "")
      else {
        val parts = types.split(",")
        assert(parts.length === n)
        assert(parts.forall(Set("car", "bus", "truck", "motorbike")))
      }
    }
  }

  test("malformed payloads yield a typed row, not the reference's bare-0 bug") {
    val raw = Seq(
      """{"camera_id": "CAM_1", "timestamp": 1.5, "frame_data": "%%%not-base64%%%"}""",
      """{"camera_id": "CAM_2", "timestamp": 2.5, "frame_data": null}""",
      """not json at all""")
      .toDF("value")
    val out = VehiclePipeline.transformAll(raw, Some(new java.sql.Timestamp(0L)))
    val rows = out.collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Int]("count") >= 0)
      assert(r.getAs[String]("vehicle_type") != null)
    }
  }

  test("detection throughput beats the reference's 8 fps baseline") {
    // BASELINE.md: ~8 frames/s per-row Python UDF. The Column-based mock
    // pipeline must sustain far more on a single core's worth of work.
    val n = 50000
    val payload = Base64.getEncoder.encodeToString(Array.fill[Byte](512)(7))
    val raw = spark.range(n).select(
      concat(lit("""{"camera_id": "CAM_"""), col("id") % 3,
        lit("""", "timestamp": """), col("id").cast("double"),
        lit(""", "frame_data": """"), lit(payload), lit("\"}")).as("value"))
    val t0 = System.nanoTime()
    val cnt = VehiclePipeline.transformAll(raw, None).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cnt === n)
    val fps = n / secs
    info(f"mock pipeline throughput: $fps%.0f frames/s")
    assert(fps > 1000, f"expected >1000 fps, got $fps%.0f")
  }
}
