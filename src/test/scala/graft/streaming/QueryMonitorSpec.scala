package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class QueryMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("monitor observes batch progress, rows, and staleness") {
    val monitor = new QueryMonitor().attach(spark)
    try {
      val input = MemoryStream[Int](spark)
      input.addData(1 to 100: _*)
      val q = input.toDS().writeStream
        .format("memory").queryName("monitored")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      // listener events are async; give the bus a moment
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline && monitor.totalRows < 100)
        Thread.sleep(100)
      assert(monitor.totalRows === 100L)
      assert(monitor.batches.nonEmpty)
      assert(monitor.batches.forall(_.queryName == "monitored"))
      assert(monitor.stalenessMs < 60000)
    } finally monitor.detach(spark)
  }
}
