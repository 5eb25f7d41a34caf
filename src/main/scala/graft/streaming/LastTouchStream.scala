package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** X123 — streaming last-touch attribution: the low-latency form of
  * the batch q165 ([[graft.operators.Attribution.lastTouch]]) — a
  * purchase is credited the moment it arrives, against per-user state
  * holding only the LATEST marketing touch seen so far (one row per
  * user: us + event_id + event_type — the state store is |users|-
  * bounded forever, like [[RateWatch]]).
  *
  * Semantics contract, stated honestly:
  *   - WITHIN a micro-batch the group's events are sorted by
  *     (us, event_id) before the fold, so intra-batch ordering matches
  *     the batch operator exactly (a group iterator is otherwise
  *     partition-ordered).
  *   - ACROSS batches the fold is arrival-ordered: a touch that
  *     arrives in a LATER batch than the purchase it preceded in event
  *     time cannot retro-attribute (the state held the older touch
  *     when the purchase was processed). In-order delivery per user —
  *     the X71/Kafka per-key partition-affinity contract — makes
  *     streamed ≡ batch EXACTLY (spec-proven under slicings); under
  *     out-of-order delivery the batch q165 is the backfill corrector,
  *     the standard lambda split.
  *   - Pure integer state and comparisons ⇒ a checkpoint replay
  *     re-emits identical attributions.
  */
object LastTouchStream {

  /** Lookback window, shared with the batch operator. */
  val LookbackUs: Long = graft.operators.Attribution.LookbackDays *
    86400000000L

  final case class TouchState(us: Long, eventId: Long, channel: String)
  final case class AttributionRow(purchase_id: Long, user_id: Long,
      attrib_event_id: Option[Long], attrib_channel: String,
      lag_seconds: Option[Double])

  /** Wire the attributor over an event stream with columns
    * (event_id, user_id, event_type, us).
    */
  def attribute(input: DataFrame): Dataset[AttributionRow] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.select(col("event_id").cast("long"),
      col("user_id").cast("long"), col("event_type").cast("string"),
      col("us").cast("long"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[TouchState, AttributionRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String, Long)],
            state: GroupState[TouchState]) =>
          var touch = state.getOption.orNull
          val out = scala.collection.mutable.ListBuffer
            .empty[AttributionRow]
          // intra-batch event-time order — the batch operator's order
          rows.toSeq.sortBy(r => (r._4, r._1)).foreach {
            case (eventId, _, etype, us) =>
              etype match {
                case "view" | "click" =>
                  touch = TouchState(us, eventId, etype)
                case "purchase" =>
                  val inWindow = touch != null &&
                    us - touch.us <= LookbackUs && us >= touch.us
                  out += (if (inWindow)
                    AttributionRow(eventId, user, Some(touch.eventId),
                      touch.channel,
                      Some((us - touch.us).toDouble / 1000000.0d))
                  else
                    AttributionRow(eventId, user, None, "organic", None))
                case _ => ()
              }
          }
          if (touch != null) state.update(touch)
          out.iterator
      }
  }

  /** Run the attributor into an appending parquet sink via
    * foreachBatch (checkpoint-recoverable, unlike the memory sink —
    * a restart resumes the per-user touch state and keeps appending).
    */
  def start(input: DataFrame, checkpointDir: String, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    attribute(input).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch {
        (batch: Dataset[AttributionRow], _: Long) =>
          batch.write.mode("append").parquet(outDir)
      }
      .start()
}
