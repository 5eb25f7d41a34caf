package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** [[StreamSupervisor]]: the engine-native Airflow restart loop
  * (`dags/absa_streaming_lifecycle_dag.py:37-50`). A crash-looping query
  * is restarted up to the budget then surfaced as failed; a query that
  * recovers is restarted and completes with no lost rows; a stalled
  * stream is detected via [[QueryMonitor]] staleness.
  */
class SupervisorSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType)))

  private def writeInput(dir: String, name: String, ids: Range): Unit =
    Files.writeString(Paths.get(dir, name),
      ids.map(i => s"""{"id": $i}""").mkString("\n"))

  test("crash-looping query restarts N times then surfaces the failure") {
    val inDir = tmpDir("sup-in")
    val ckpt = tmpDir("sup-ckpt")
    writeInput(inDir, "a.json", 0 until 10)
    val starts = new AtomicInteger(0)
    def start() = {
      starts.incrementAndGet()
      spark.readStream.schema(schema).json(inDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (_: DataFrame, _: Long) =>
          throw new RuntimeException("permanent failure")
        }
        .start()
    }
    val sup = new StreamSupervisor(start _, maxRestarts = 3, backoffMs = 10)
    val result = sup.run()
    assert(result.isLeft, "a permanently-crashing query must surface as failed")
    assert(starts.get() === 4, "initial start + 3 restarts")
    assert(sup.restarts === 3)
  }

  test("transient crashes are restarted; all rows land (at-least-once)") {
    val inDir = tmpDir("sup2-in")
    val outDir = tmpDir("sup2-out")
    val ckpt = tmpDir("sup2-ckpt")
    writeInput(inDir, "a.json", 0 until 100)
    val crashesLeft = new AtomicInteger(2)
    def start() = spark.readStream.schema(schema).json(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (crashesLeft.getAndDecrement() > 0)
          throw new RuntimeException("transient crash")
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    val sup = new StreamSupervisor(start _, maxRestarts = 5, backoffMs = 10)
    val result = sup.run()
    assert(result === Right(2), "clean stop after two crash-restarts")
    assert(spark.read.parquet(outDir).select("id").distinct().count() === 100,
      "checkpoint resume must replay the failed batch: no lost rows")
  }

  test("stalled stream is detected by staleness and restarts consume the budget") {
    val inDir = tmpDir("sup3-in")
    val ckpt = tmpDir("sup3-ckpt")
    writeInput(inDir, "a.json", 0 until 5)
    // a monitor that is never attached: lastEventAt frozen at creation →
    // stalenessMs grows, simulating a wedged stream with no progress
    val monitor = new QueryMonitor
    Thread.sleep(300)
    def start() = spark.readStream.schema(schema).json(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (_: DataFrame, _: Long) => () }
      .start()
    val sup = new StreamSupervisor(start _, maxRestarts = 1, backoffMs = 10,
      stalenessLimitMs = 200, monitor = Some(monitor), pollMs = 50)
    val result = sup.run()
    assert(result.isLeft)
    assert(result.left.exists(_.getMessage.contains("no streaming progress")),
      s"staleness must be the surfaced failure, got $result")
  }
}

/** [[RetrainLoop]]: train → eval gate → promote → artifact touch →
  * [[ScorerProvider]] hot reload (reference `train_retrain.py:26-54` +
  * `absa_streaming_lifecycle_full.py:38-73`). A promoted model must
  * change `model_version` in the next scored batch; a rejected one must
  * not.
  */
class RetrainLoopSpec extends SparkSpec {

  test("promotion gate: only a strictly better model changes the provider version") {
    val dir = Paths.get(tmpDir("retrain"))
    val evalPath = dir.resolve("models").resolve("eval_result.json")
    val artifact = dir.resolve("models").resolve("model.bin")

    // bootstrap: first model always promotes (incumbent acc = 0)
    val o1 = RetrainLoop.cycle(() => (0.83, 0.84), evalPath, artifact)
    assert(o1.promoted && o1.bestAcc === 0.83)
    val provider = new ScorerProvider(artifact)
    val v1 = provider.reloadIfUpdated()
    assert(v1 !== "unloaded")

    // worse candidate: rejected, artifact untouched, version stable
    val o2 = RetrainLoop.cycle(() => (0.80, 0.81), evalPath, artifact)
    assert(!o2.promoted && o2.bestAcc === 0.83)
    assert(provider.reloadIfUpdated() === v1,
      "a rejected model must not change the active version")

    // better candidate: promoted, provider picks the new version up
    val o3 = RetrainLoop.cycle(() => (0.86, 0.86), evalPath, artifact)
    assert(o3.promoted && o3.bestAcc === 0.86)
    val v3 = provider.reloadIfUpdated()
    assert(v3 !== v1, "a promoted model must change the active version")

    // registry state survives: the gate reads the persisted best
    assert(ModelRegistry.read(evalPath).bestModelAcc === 0.86)
  }

  test("promoted version reaches the next scored batch; rejected does not") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Paths.get(tmpDir("retrain-batch"))
    val evalPath = dir.resolve("eval_result.json")
    val artifact = dir.resolve("model.bin")
    RetrainLoop.cycle(() => (0.83, 0.84), evalPath, artifact)

    val provider = new ScorerProvider(artifact)
    val versions = scala.collection.mutable.ListBuffer.empty[String]
    val input = MemoryStream[String](spark)
    val q = AbsaPipeline.sink(
      AbsaPipeline.parse(input.toDF()), provider,
      writePrimary = (df, _) => versions ++=
        df.select("model_version").distinct().as[String].collect(),
      onFallback = (_, _, e) => throw e,
      checkpointDir = tmpDir("retrain-ckpt"),
      trigger = Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      input.addData("""{"id": "1", "review": "tot"}""")
      q.processAllAvailable()
      // rejected retrain between batches: version must NOT move
      RetrainLoop.cycle(() => (0.70, 0.70), evalPath, artifact)
      input.addData("""{"id": "2", "review": "xau"}""")
      q.processAllAvailable()
      // promoted retrain: next batch must carry the NEW version
      RetrainLoop.cycle(() => (0.90, 0.90), evalPath, artifact)
      input.addData("""{"id": "3", "review": "dep"}""")
      q.processAllAvailable()
    } finally q.stop()

    assert(versions.size === 3)
    assert(versions(0) === versions(1),
      "rejected model must leave the batch version unchanged")
    assert(versions(2) !== versions(1),
      "promoted model must stamp the new version into the next batch")
  }
}
