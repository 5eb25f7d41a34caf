package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LastTouchStream]] (X123) oracles: under in-order per-user
  * delivery (the X71/Kafka partition-affinity contract) the streamed
  * attribution must equal the batch q165 EXACTLY, under any
  * chronological slicing; state is one touch row per user; a
  * continued run (same checkpoint) picks up state across triggers —
  * a touch in batch 1 attributes a purchase in batch 2.
  */
class LastTouchStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def snap(rows: Seq[(Long, Long, Option[Long], String,
      Option[Double])]): Seq[String] =
    rows.sortBy(_._1).map(_.toString)

  test("streamed == batch q165 exactly over the real corpus under " +
      "chronological 3-batch slicing") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val batch = graft.operators.Attribution.lastTouch(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val rows = ev.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
      .sortBy(r => (r._4, r._1)) // chronological arrival
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, String, Long)](spark)
    val ckpt = tmpDir("lt-ckpt")
    val out = tmpDir("lt-out") + "/rows"
    def drain(): Unit = {
      val q = LastTouchStream.start(
        input.toDF().toDF("event_id", "user_id", "event_type", "us"),
        ckpt, out)
      q.awaitTermination(120000)
    }
    val third = rows.length / 3
    input.addData(rows.take(third)); drain()
    input.addData(rows.slice(third, 2 * third)); drain()
    input.addData(rows.drop(2 * third)); drain()
    val streamed = spark.read.parquet(out)
      .select(col("purchase_id"), col("user_id"), col("attrib_event_id"),
        col("attrib_channel"), col("lag_seconds")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(streamed.length === batch.length)
    assert(snap(streamed.toSeq) === snap(batch.toSeq),
      "streamed attribution must equal the batch operator's")
  }

  test("state carries across batches: a touch in batch 1 attributes " +
      "a purchase in batch 2; a NEWER touch replaces the state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, String, Long)](spark)
    val ckpt = tmpDir("lt-carry-ckpt")
    val out = tmpDir("lt-carry-out") + "/rows"
    def drain(): Unit = {
      val q = LastTouchStream.start(
        input.toDF().toDF("event_id", "user_id", "event_type", "us"),
        ckpt, out)
      q.awaitTermination(120000)
    }
    input.addData(Seq((1L, 7L, "view", 100L), (2L, 7L, "click", 200L)))
    drain()
    input.addData(Seq((3L, 7L, "purchase", 300L)))
    drain()
    input.addData(Seq((4L, 7L, "view", 400L), (5L, 7L, "purchase", 500L)))
    drain()
    val got = spark.read.parquet(out)
      .select(col("purchase_id"), col("user_id"), col("attrib_event_id"),
        col("attrib_channel")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(3L) === (2L, "click"), "batch-1 click attributes")
    assert(got(5L) === (4L, "view"), "newer view replaces the click")
  }
}
