package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Fault tolerance (S30): the reference crashes its consumer every Nth
  * batch and relies on Airflow restart + checkpoint resume
  * (`spark_kafka_consumer_dag.py:160-162`, attempt={1..9} logs). Here the
  * same contract is proven in-process: a foreachBatch sink crashes
  * mid-stream, the query is restarted on the same checkpoint, and every
  * input row still reaches the sink (at-least-once; JDBC-append semantics
  * per SURVEY §7.4).
  */
class CheckpointRestartSpec extends SparkSpec {

  test("crash mid-batch, restart from checkpoint, no lost rows") {
    val inDir = tmpDir("ckpt-in")
    val outDir = tmpDir("ckpt-out")
    val ckpt = tmpDir("ckpt-wal")
    val schema = StructType(Seq(StructField("id", LongType)))

    def writeInput(name: String, ids: Range): Unit = {
      val p = Paths.get(inDir, name)
      Files.writeString(p,
        ids.map(i => s"""{"id": $i}""").mkString("\n"))
    }

    val crashOnce = new AtomicBoolean(true)
    def start() = spark.readStream.schema(schema).json(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val hasCrashMarker =
          batch.filter(col("id") === 150).count() > 0
        if (hasCrashMarker && crashOnce.getAndSet(false))
          throw new RuntimeException("simulated crash (reference S30)")
        batch.write.mode("append").parquet(outDir)
      }
      .start()

    writeInput("a.json", 0 until 100)
    val q1 = start()
    q1.processAllAvailable()

    // second file carries the crash marker → the batch fails once
    writeInput("b.json", 100 until 200)
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    assert(!q1.isActive, "query must have died on the simulated crash")

    // restart on the same checkpoint: the failed batch replays
    val q2 = start()
    q2.processAllAvailable()
    writeInput("c.json", 200 until 250)
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(outDir)
      .select("id").distinct().count()
    assert(ids === 250, "every input row must survive the crash+restart")

    // file source + checkpoint replays whole batches; duplicates are
    // allowed (at-least-once) but bounded by one batch replay
    val total = spark.read.parquet(outDir).count()
    assert(total >= 250 && total <= 350)
  }
}
