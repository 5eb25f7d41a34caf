package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X140 — streaming maintenance of the X138 out-of-orderness profile:
  * the watermark-health dashboard kept current per ingest batch
  * instead of recomputed by a nightly scan. State is ONE row per event
  * type — (high-water mark, n, n_late, n_beyond_1m, max_late_us) —
  * and each batch folds in via [[graft.operators.MaterializedAgg
  * .foldOnceAs]]: the per-event lateness inside a batch is measured
  * against the running max SEEDED by the state's high-water mark, so
  * a cross-batch straggler (late vs an event absorbed three batches
  * ago) is counted exactly like the batch operator counts it.
  *
  * Contract (the X123 in-order discipline, stated honestly): under
  * CHRONOLOGICAL batch slicing — the X71/Kafka per-partition arrival
  * order — the maintained counters are BIT-IDENTICAL to the batch
  * q179 profile over the same absorbed events (the spec proves it,
  * plus replay idempotence and a kill+restart over the X71 source);
  * the update is a sequential fold, not a commutative merge, so
  * arbitrary re-slicing gets batch q179 as its corrector. Percentile
  * columns stay batch-side (they need the full lateness distribution;
  * the counts/max here are the alerting surface).
  *
  * Scale: per batch ONE type-partitioned window over the DELTA only
  * plus a |types|-row state union — never a rescan.
  */
object LatenessStream {

  /** One fold step: profile the delta against the seeded high-water
    * mark, then combine counters with the previous state.
    */
  def step(state: Option[DataFrame], delta: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = delta.select(col("event_type"), col("event_id"),
      expr("unix_micros(ts)").as("us"))
    val withState = state match {
      case Some(st) => base.join(
        st.select(col("event_type"), col("hwm_us").as("state_hwm")),
        Seq("event_type"), "left")
      case None => base.withColumn("state_hwm", lit(null).cast("long"))
    }
    val seeded = withState
      .withColumn("hwm",
        greatest(max(col("us")).over(w), col("state_hwm")))
      .withColumn("late_us",
        greatest(col("hwm") - col("us"), lit(0L)))
    val batchAgg = seeded.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        sum(when(col("late_us") > 60000000L, 1L).otherwise(0L))
          .as("n_beyond_1m"),
        max(col("late_us")).as("max_late_us"),
        max(col("us")).as("hwm_us"))
    state match {
      case None => batchAgg
      case Some(st) =>
        st.unionByName(batchAgg)
          .groupBy(col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("n_late")).as("n_late"),
            sum(col("n_beyond_1m")).as("n_beyond_1m"),
            max(col("max_late_us")).as("max_late_us"),
            max(col("hwm_us")).as("hwm_us"))
    }
  }

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    graft.operators.MaterializedAgg.foldOnceAs(delta, path, batchId, step)

  /** Read the maintained profile back, rendered like q179's counter
    * columns.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    graft.operators.MaterializedAgg.recover(spark, path)
    spark.read.parquet(path)
      .select(col("event_type"), col("n"), col("n_late"),
        col("n_beyond_1m"), col("max_late_us"))
      .orderBy(col("event_type"))
  }
}
