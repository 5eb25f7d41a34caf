package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** The 100 TB state-store story, pinned (SURVEY §7.4): stateful streaming
  * operators must run on RocksDBStateStoreProvider — the default
  * HDFSBackedStateStore keeps ALL state on-heap, which caps total state at
  * executor heap and stalls with GC at corpus scale, while RocksDB spills
  * to local disk with bounded memory — and the watermark must actually
  * EVICT expired state (otherwise state grows without bound no matter
  * where it lives). Both properties are asserted from query progress, not
  * assumed: the provider via its rocksdb* custom metrics, eviction via
  * numRowsTotal dropping after the watermark passes the open windows.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The provider class is read from the session conf when the query
    * starts, so scoping the setting around start() is enough; restore so
    * the shared test session is unchanged for other suites.
    */
  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  final case class ShapedFrame(camera_id: String, vehicle_type: String,
      count: Int, frame_time: Timestamp)

  final case class Msg(id: String, ts: Timestamp, body: String)

  /** Latest progress that actually ran a stateful batch. */
  private def lastStateProgress(q: StreamingQuery) =
    q.recentProgress.reverse
      .find(p => p.stateOperators.nonEmpty)
      .getOrElse(fail("no progress with state operators"))
      .stateOperators.head

  private def assertRocksDbActive(q: StreamingQuery): Unit = {
    val metrics = lastStateProgress(q).customMetrics
    assert(metrics.keySet.stream.anyMatch(_.startsWith("rocksdb")),
      s"expected rocksdb* custom metrics, got ${metrics.keySet}")
  }

  test("windowed agg on RocksDB: provider active, expired windows evicted") {
    withRocksDb {
      val input = MemoryStream[ShapedFrame](spark)
      val q = StreamingAggregates
        .vehicleTrend(input.toDF(), watermark = "2 minutes")
        .writeStream.outputMode("append")
        .format("memory").queryName("rocks_trend")
        .start()
      try {
        input.addData(
          ShapedFrame("CAM_1", "car", 2, ts(0, 10)),
          ShapedFrame("CAM_1", "bus", 1, ts(0, 20)),
          ShapedFrame("CAM_2", "car", 3, ts(1, 5)),
          ShapedFrame("CAM_2", "truck", 1, ts(1, 30)),
          ShapedFrame("CAM_3", "car", 4, ts(2, 0)))
        q.processAllAvailable()
        assertRocksDbActive(q)
        val live = lastStateProgress(q).numRowsTotal
        assert(live >= 5, s"expected >=5 open window groups, got $live")

        // advance the watermark far past the open windows; the closing
        // batch emits them and MUST free their state rows
        input.addData(ShapedFrame("CAM_1", "car", 1, ts(30, 0)))
        q.processAllAvailable()
        input.addData(ShapedFrame("CAM_1", "car", 1, ts(31, 0)))
        q.processAllAvailable()
        val after = lastStateProgress(q).numRowsTotal
        assert(after < live,
          s"watermark-expired window state not evicted: $live -> $after")
        // the closed windows were emitted, not dropped
        assert(spark.table("rocks_trend").count() >= 5)
      } finally q.stop()
    }
  }

  test("session windows on RocksDB: gap-merged state evicted after the " +
      "watermark passes (VERDICT r9 item 8's missing assertion)") {
    withRocksDb {
      val input = MemoryStream[ShapedFrame](spark)
      val q = StreamingAggregates
        .cameraSessions(input.toDF(), gap = "30 seconds",
          watermark = "1 minute")
        .writeStream.outputMode("append")
        .format("memory").queryName("rocks_sessions")
        .start()
      try {
        // two cameras, events inside one 30 s gap each → two open
        // sessions buffered in state
        input.addData(
          ShapedFrame("CAM_1", "car", 2, ts(0, 0)),
          ShapedFrame("CAM_1", "bus", 1, ts(0, 20)),
          ShapedFrame("CAM_2", "car", 3, ts(0, 10)))
        q.processAllAvailable()
        assertRocksDbActive(q)
        val live = lastStateProgress(q).numRowsTotal
        assert(live >= 2, s"expected >=2 open sessions in state, got $live")

        // advance the watermark far past both sessions' gap end; the
        // closing batches must EMIT them and FREE their state — the
        // bounded-state property that makes session_window safe at
        // corpus scale. The two advancing ticks are 20 s apart (inside
        // the 30 s gap) so they MERGE into one open session: state
        // afterwards is 1 < 2 iff the expired sessions were evicted.
        input.addData(ShapedFrame("CAM_1", "car", 1, ts(30, 0)))
        q.processAllAvailable()
        input.addData(ShapedFrame("CAM_1", "car", 2, ts(30, 20)))
        q.processAllAvailable()
        val after = lastStateProgress(q).numRowsTotal
        assert(after < live,
          s"watermark-expired session state not evicted: $live -> $after")

        // the closed sessions were emitted with gap-merge semantics
        // intact: CAM_1's two frames merged into ONE session of count 3
        val rows = spark.table("rocks_sessions")
          .selectExpr("camera_id", "total").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        assert(rows.contains(("CAM_1", 3L)) && rows.contains(("CAM_2", 3L)),
          s"session merge semantics changed on RocksDB: $rows")
      } finally q.stop()
    }
  }

  test("dropDuplicatesWithinWatermark on RocksDB: dedup state evicted") {
    withRocksDb {
      val input = MemoryStream[Msg](spark)
      val q = StreamingAggregates
        .dedupStream(input.toDF(), Seq("id"), "ts", watermark = "5 minutes")
        .writeStream.outputMode("append")
        .format("memory").queryName("rocks_dedup")
        .start()
      try {
        input.addData(
          Msg("a", ts(0, 0), "first"),
          Msg("b", ts(0, 30), "second"),
          Msg("c", ts(1, 0), "third"),
          Msg("a", ts(1, 30), "dup"))
        q.processAllAvailable()
        assertRocksDbActive(q)
        val live = lastStateProgress(q).numRowsTotal
        assert(live >= 3, s"expected >=3 dedup keys in state, got $live")

        input.addData(Msg("z1", ts(30, 0), "tick"))
        q.processAllAvailable()
        input.addData(Msg("z2", ts(31, 0), "tick2"))
        q.processAllAvailable()
        val after = lastStateProgress(q).numRowsTotal
        assert(after < live,
          s"watermark-expired dedup keys not evicted: $live -> $after")

        val bodies = spark.table("rocks_dedup")
          .selectExpr("body").as[String].collect().toSet
        assert(bodies === Set("first", "second", "third", "tick", "tick2"),
          s"dedup semantics must be unchanged on RocksDB: $bodies")
      } finally q.stop()
    }
  }
}
