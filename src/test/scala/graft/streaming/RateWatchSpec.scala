package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** [[RateWatch]] (X96) oracles: a steady stream at the expected rate
  * never alarms (CUSUM clamps at 0), a sustained burst accumulates
  * across micro-batches and alarms exactly when the cumulative excess
  * crosses h, and recovery decays the statistic.
  */
class RateWatchSpec extends SparkSpec {
  import spark.implicits._

  test("steady rate clamps at 0; a sustained burst alarms exactly " +
      "when cumulative excess crosses h; recovery decays") {
    val input = MemoryStream[String](spark)
    // k=5 expected per batch, h=6 alarm mass
    val q = RateWatch.watch(input.toDF().toDF("src"), "src", k = 5, h = 6)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ratewatch")
      .start()
    try {
      def batch(n: Int): Unit = {
        input.addData(Seq.fill(n)("cam1"))
        q.processAllAvailable()
      }
      batch(5)  // s = 0
      batch(4)  // s = 0 (clamped)
      batch(9)  // s = 4           — excess accumulating, no alarm
      batch(9)  // s = 8 > 6      — ALARM
      batch(1)  // s = 4           — recovery decays
      q.stop()
      val rows = spark.table("ratewatch")
        .selectExpr("batch_n", "cusum", "alarm")
        .as[(Long, Long, Boolean)].collect().toSeq
      assert(rows.map(_._2) === Seq(0L, 0L, 4L, 8L, 4L))
      assert(rows.map(_._3) === Seq(false, false, false, true, false))
    } finally if (q.isActive) q.stop()
  }

  test("keys keep independent state") {
    val input = MemoryStream[String](spark)
    val q = RateWatch.watch(input.toDF().toDF("src"), "src", k = 2, h = 3)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ratewatch2")
      .start()
    try {
      input.addData(Seq.fill(8)("a") ++ Seq.fill(2)("b"))
      q.processAllAvailable()
      q.stop()
      // a: 8-2=6 > 3 alarms; b: 0 stays silent
      assert(spark.table("ratewatch2").count() === 2)
      val byKey = spark.table("ratewatch2")
        .selectExpr("key", "cusum", "alarm")
        .as[(String, Long, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(byKey("a") === ((6L, true)))
      assert(byKey("b") === ((0L, false)))
    } finally if (q.isActive) q.stop()
  }
}
