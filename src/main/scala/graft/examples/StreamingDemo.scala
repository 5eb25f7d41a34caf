package graft.examples

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.streaming._

/** Runnable end-to-end demo of both streaming pipelines — the library's
  * example entry point (`sbt "runMain graft.examples.StreamingDemo"`).
  * Replays fixture-shaped records through a memory stream (stand-in for
  * the Kafka topics, which need the spark-sql-kafka connector jar) and
  * prints the sink contents.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._

    // --- ABSA pipeline: parse → score → hot-reloaded version → sink
    val artifact = java.nio.file.Files
      .createTempDirectory("absa-model").resolve("model.bin")
    java.nio.file.Files.writeString(artifact, "weights-v1")
    val provider = new ScorerProvider(artifact)
    val reviews = MemoryStream[String](spark)
    val out = java.nio.file.Files.createTempDirectory("absa-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("absa-ckpt").toString
    // add data BEFORE start: AvailableNow snapshots available offsets at
    // query start and terminates once they're processed
    reviews.addData(
      """{"id": "1", "review": "Hang ve dep lam nha ship than thien!"}""",
      """{"id": "2", "review": "giay te, chat luong kem"}""",
      """{"id": "3", "review": "ok"}""")
    // production shape: the query runs under the supervisor (bounded
    // crash-restarts on the same checkpoint — the Airflow retry loop
    // engine-native)
    def startQuery() = AbsaPipeline
      .sink(AbsaPipeline.parse(reviews.toDF()), provider,
        writePrimary = (df, _) => df.write.mode("append").parquet(out),
        onFallback = (_, id, e) =>
          System.err.println(s"[fallback] batch $id: ${e.getMessage}"),
        checkpointDir = ckpt, trigger = Trigger.AvailableNow())
      .start()
    new StreamSupervisor(startQuery _, maxRestarts = 3, backoffMs = 500)
      .run() match {
      case Right(restarts) =>
        println(s"=== ABSA sink (clean stop, $restarts restarts) ===")
      case Left(err) =>
        System.err.println(s"[supervisor] gave up: ${err.getMessage}")
    }
    spark.read.parquet(out).orderBy("id").show(truncate = false)

    // --- Vehicle pipeline: frames → detect → shape (batch-mode transforms)
    val frames = Seq(
      """{"camera_id": "CAM_1", "timestamp": 1761884464.47, "frame_data": "AQIDBA=="}""",
      """{"camera_id": "CAM_2", "timestamp": 1761884465.99, "frame_data": "CQkJ"}""",
      """{"camera_id": "CAM_3", "timestamp": 1761884466.10, "frame_data": "%%%bad%%%"}""")
      .toDF("value")
    println("=== Vehicle transform ===")
    VehiclePipeline.transformAll(frames, None).show(truncate = false)

    // --- Stateful aggregation: per-camera running totals
    val cams = MemoryStream[StreamingAggregates.CameraEvent](spark)
    val running = StreamingAggregates.runningCameraTotals(cams.toDS())
      .writeStream.outputMode("update").format("console").start()
    cams.addData(StreamingAggregates.CameraEvent("CAM_1", 2),
      StreamingAggregates.CameraEvent("CAM_1", 3))
    running.processAllAvailable()
    running.stop()
    spark.stop()
  }
}
