package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[HeavyHitters]] (X105) oracles — the two Misra–Gries guarantees
  * checked against exact counts on planted streams, under different
  * batch slicings (MG merge is order-sensitive WITHIN its bounds, so
  * the oracle is the bounds, not state equality), plus replay safety
  * and the MemoryStream end-to-end form.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = HeavyHitters.K

  /** Zipf-ish planted stream: "hot" ≈ 30%, "warm" ≈ 10%, a long tail
    * of cold keys.
    */
  private def stream(n: Int): Seq[String] =
    (0 until n).map { i =>
      if (i % 10 < 3) "hot"
      else if (i % 10 == 3) "warm"
      else s"cold${i % 97}"
    }

  private def mergeSlices(rows: Seq[String], slices: Int): String = {
    val path = tmpDir("mg") + "/state"
    rows.zipWithIndex.groupBy(_._2 % slices).toSeq.sortBy(_._1)
      .foreach { case (b, chunk) =>
        HeavyHitters.mergeOnce(chunk.map(_._1).toDF("k"), "k", path,
          b.toLong)
      }
    path
  }

  private def check(rows: Seq[String], path: String): Unit = {
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val got = HeavyHitters.read(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.nonEmpty)
    val err = got.head._3
    val est = got.map(t => t._1 -> t._2).toMap
    // guarantee 1: any key over the n/(k+1) threshold is present
    truth.foreach { case (k, c) =>
      if (c > n / (K + 1))
        assert(est.contains(k), s"heavy key $k (true $c, n=$n) missing")
    }
    // guarantee 2: est <= true <= est + err for EVERY key
    truth.foreach { case (k, c) =>
      val e = est.getOrElse(k, 0L)
      assert(e <= c, s"$k overcounted: est $e > true $c")
      assert(c <= e + err, s"$k bound violated: true $c > $e + $err")
    }
  }

  test("MG guarantees hold after a 4-slice merge: heavy keys present, " +
      "est <= true <= est + err_bound for every key") {
    val rows = stream(4000)
    check(rows, mergeSlices(rows, 4))
  }

  test("a different slicing still satisfies the bounds (summaries may " +
      "differ; the GUARANTEES may not)") {
    val rows = stream(4000)
    check(rows, mergeSlices(rows, 7))
    check(rows, mergeSlices(rows, 1)) // one-shot
  }

  test("replayed batch id is a no-op (inherited X98 exactly-once)") {
    val rows = stream(1000)
    val path = mergeSlices(rows, 2)
    val before = HeavyHitters.read(spark, path).collect().toSeq.map(_.toString)
    HeavyHitters.mergeOnce(rows.toDF("k"), "k", path, 1L) // replay id
    val after = HeavyHitters.read(spark, path).collect().toSeq.map(_.toString)
    assert(after === before, "replayed batch changed the summary")
    check(rows, path)
  }

  test("streaming form end-to-end: MemoryStream batches satisfy the " +
      "guarantees over the absorbed stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmpDir("mg-stream") + "/state"
    val ckpt = tmpDir("mg-stream-ckpt")
    val rows = stream(3000)
    val input = MemoryStream[String](spark)
    def runAvailable(): Unit = {
      val q = HeavyHitters.stream(input.toDF().toDF("k"), "k", path, ckpt)
      q.awaitTermination(120000)
    }
    input.addData(rows.take(1500)); runAvailable()
    input.addData(rows.drop(1500)); runAvailable()
    check(rows, path)
  }

  test("X105 summary maintenance survives a REAL kill between state " +
      "swap and checkpoint commit (X71 source): restart replays the " +
      "batch id, merge skips it, state == an identical unkilled run " +
      "and the MG guarantees hold") {
    import graft.streaming.EmbeddedLog
    val rows = stream(3000)
    def feed(topic: String): Unit = {
      EmbeddedLog.createTopic(topic, 2)
      rows.zipWithIndex.foreach { case (k, i) =>
        EmbeddedLog.sendString(topic, k, s"""{"k":"$k"}""", 1000L + i)
      }
    }
    def run(topic: String, path: String, ckpt: String,
        kill: Option[java.util.concurrent.atomic.AtomicBoolean])
        : org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[graft.streaming.EmbeddedLogProvider].getName)
        .option("topic", topic).option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "1000")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), 'k STRING') AS j")
        .selectExpr("j.k AS k")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          HeavyHitters.mergeOnce(b, "k", path, id)
          // the crash window under test: summary swapped, checkpoint
          // for this batch NOT yet committed
          if (id == 1L && kill.exists(_.getAndSet(false)))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    // killed + restarted run
    val pathK = tmpDir("mg-ks") + "/state"
    val ckptK = tmpDir("mg-ks-ckpt")
    feed("mgkill")
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val q1 = run("mgkill", pathK, ckptK, Some(killOnce))
    intercept[Exception] { q1.processAllAvailable() }
    assert(MaterializedAgg.committedBatch(spark, pathK) >= 1L,
      "batch 1's state swap happened before the kill")
    val q2 = run("mgkill", pathK, ckptK, None)
    q2.processAllAvailable()
    q2.stop()
    // identical unkilled run: same data, same admission cap -> the
    // same batch sequence, so the (order-sensitive within bounds) MG
    // state must be IDENTICAL if and only if the replay was a no-op
    val pathC = tmpDir("mg-ks-clean") + "/state"
    val ckptC = tmpDir("mg-ks-clean-ckpt")
    feed("mgclean")
    val q3 = run("mgclean", pathC, ckptC, None)
    q3.processAllAvailable()
    q3.stop()
    val snapK = HeavyHitters.read(spark, pathK).collect()
      .toSeq.map(_.toString)
    val snapC = HeavyHitters.read(spark, pathC).collect()
      .toSeq.map(_.toString)
    assert(snapK === snapC,
      "killed+restarted summary must equal the unkilled run's")
    check(rows, pathK)
    EmbeddedLog.dropTopic("mgkill"); EmbeddedLog.dropTopic("mgclean")
  }
}
