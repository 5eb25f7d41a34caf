package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.MaterializedAgg

/** X182 — streaming maintenance of the X179 debounce audit: the
  * retry/double-fire census kept current per ingest batch — an SDK
  * regression that starts double-sending shows up one batch later,
  * not at the nightly audit. The bounce test compares each event to
  * its immediate same-(user, type) predecessor, so the state is the
  * natural sessionizer state: per (user, type) the last-seen
  * timestamp plus the event/bounce counters — |users × types| rows,
  * the user dimension, NOT the stream (stated: every debouncer /
  * sessionizer carries exactly this state).
  *
  * Each batch folds in via [[graft.operators.MaterializedAgg
  * .foldOnceAs]] (the X140 order-dependent discipline): the batch's
  * first event per key measures its gap against the STATE's last
  * timestamp — a bounce pair SPLIT across batches is counted exactly
  * like the batch operator counts it. Contract stated honestly (the
  * X123/X140 in-order rule): under CHRONOLOGICAL slicing the
  * maintained census ≡ batch q217 bit-for-bit (lag chains read
  * forward only); arbitrary re-slicing gets q217 as its corrector.
  *
  * Per batch: ONE (user, type)-partitioned window over the DELTA
  * only + a state-sized union-merge — never a rescan.
  */
object DebounceStream {

  /** One fold step: flag bounces in the delta seeded by the state's
    * per-key last timestamp, then merge counters.
    */
  def step(state: Option[DataFrame], delta: DataFrame): DataFrame = {
    val base = delta.select(col("user_id"), col("event_type"),
      col("event_id"), expr("unix_micros(ts)").as("us"))
    val withState = state match {
      case Some(st) => base.join(
        st.select(col("user_id"), col("event_type"),
          col("last_us").as("state_last")),
        Seq("user_id", "event_type"), "left")
      case None => base.withColumn("state_last", lit(null).cast("long"))
    }
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val flagged = withState
      .withColumn("prev_us",
        coalesce(lag(col("us"), 1).over(w), col("state_last")))
      .withColumn("bounce",
        when(col("us") - col("prev_us") <=
          graft.operators.DebounceAudit.WindowSec * 1000000L, 1L)
          .otherwise(0L))
    val batchAgg = flagged
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("bounce")).as("b"),
        max(col("us")).as("last_us"))
    state match {
      case None => batchAgg
      case Some(st) =>
        st.unionByName(batchAgg)
          .groupBy(col("user_id"), col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("b")).as("b"),
            max(col("last_us")).as("last_us"))
    }
  }

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    MaterializedAgg.foldOnceAs(delta, path, batchId, step)

  /** Read the maintained census back — q217's per-type summary over
    * the maintained (user, type) counters, column-for-column.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    val perUser = spark.read.parquet(path)
    perUser
      .withColumn("worst_rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("b").desc, col("user_id"))))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("b")).as("n_bounces"),
        sum(when(col("b") > 0, 1L).otherwise(0L)).as("affected_users"),
        max(when(col("worst_rk") === 1, col("user_id")))
          .as("worst_user"),
        max(when(col("worst_rk") === 1, col("b"))).as("worst_bounces"))
      .withColumn("bounce_rate",
        col("n_bounces").cast("double") / col("n_events").cast("double"))
      .orderBy(col("event_type"))
  }
}
