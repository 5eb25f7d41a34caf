package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** X96 — streaming CUSUM rate watch: the per-key streaming form of
  * q141's batch changepoint detector. Each micro-batch contributes its
  * per-key event count x; the classic one-sided recursion
  * s' = max(0, s + x − k) runs as integer per-key STATE
  * (mapGroupsWithState), alarming once s crosses h — the
  * ingest-monitoring shape (is some source suddenly flooding or
  * silent?) where the batch operator's full-history window is
  * unavailable because the stream never ends.
  *
  * Contract notes: k (expected per-batch rate) and h (alarm mass) are
  * FROZEN parameters like [[DriftMonitor]]'s reference centroid —
  * production recalibrates them offline (e.g. from q141 over
  * yesterday) and redeploys; state per key is two longs, so the state
  * store stays |keys|-sized forever (no watermark needed for
  * boundedness, though one bounds replay); arithmetic is pure
  * integer, so restarts replay to identical alarms.
  */
object RateWatch {

  final case class KeyCount(key: String, n: Long)
  final case class CusumState(s: Long, batches: Long)
  final case class CusumRow(key: String, batch_n: Long, cusum: Long,
      alarm: Boolean)

  /** Wire the watch over a keyed stream: one output row per (key,
    * micro-batch) with the running CUSUM after that batch.
    */
  def watch(input: DataFrame, keyCol: String, k: Long, h: Long)
      : Dataset[CusumRow] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.select(col(keyCol).cast("string").as("key"))
      .groupByKey(_.getString(0))
      .mapGroupsWithState[CusumState, CusumRow](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[org.apache.spark.sql.Row],
            state: GroupState[CusumState]) =>
          val x = rows.size.toLong
          val prev = state.getOption.getOrElse(CusumState(0L, 0L))
          val s = math.max(0L, prev.s + x - k)
          state.update(CusumState(s, prev.batches + 1))
          CusumRow(key, x, s, s > h)
      }
  }
}
