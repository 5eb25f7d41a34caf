package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class ReplaySourceSpec extends SparkSpec {
  import spark.implicits._

  test("rate-driven replay emits corpus rows in index order at the set rate") {
    val corpus = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      .toDF("rid", "review")
    val stream = ReplaySource.fromRate(spark, corpus, "rid", rowsPerSecond = 50)
    val q = stream.writeStream
      .format("memory").queryName("replay")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    // let a few batches fire
    val deadline = System.currentTimeMillis() + 30000
    while (System.currentTimeMillis() < deadline &&
      spark.table("replay").count() < 10) Thread.sleep(200)
    q.stop()

    val rows = spark.table("replay")
      .select("replay_id", "rid", "review")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(rows.length >= 10, "replay must have produced rows")
    // each replayed row is the corpus row at replay_id mod |corpus|
    val byId = Map(0L -> "alpha", 1L -> "beta", 2L -> "gamma")
    rows.foreach { case (replayId, rid, review) =>
      assert(rid === replayId % 3)
      assert(review === byId(rid))
    }
  }
}
