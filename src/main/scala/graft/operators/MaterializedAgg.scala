package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X98 — incremental materialized-aggregate maintenance: a per-group
  * rollup kept as MERGEABLE partial state on disk (count, decimal sum,
  * min, max, HLL sketch for distincts), updated per batch by
  * state ∪ delta → re-combine — never by rescanning the corpus. This
  * is the warehouse face of the engine's sketch tier: at 100 TB the
  * difference between "the dashboard rollup is one sketch-sized merge
  * per ingest batch" and "the nightly job reads 100 TB"; every column
  * is chosen to be associative+commutative (the classic
  * self-maintainable-view set, plus the X44 HLL precedent for the
  * non-self-maintainable COUNT DISTINCT).
  *
  * Crash/replay: writes go to a tmp dir then swap (the Warehouse
  * compact discipline); a replayed merge of the same delta is NOT
  * idempotent for sums — the caller keys batches (the X25 checkpoint
  * contract) so each delta commits once; the spec proves merge ≡
  * one-shot recompute under any batch slicing.
  */
object MaterializedAgg {

  /** Group a delta frame to the mergeable partial shape. */
  def partials(delta: DataFrame): DataFrame =
    delta.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        hll_sketch_agg(col("u"), 12).as("hll"))

  /** Combine two partial frames (same schema) into one. */
  private def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"),
        hll_union_agg(col("hll"), lit(false)).as("hll"))

  /** Initialize the state store from a first delta. */
  def init(delta: DataFrame, path: String): Unit =
    partials(delta).write.mode("overwrite").parquet(path)

  /** Merge one delta into the state store: state ∪ partials(delta) →
    * combined, written via tmp-then-swap so a crash mid-write leaves
    * the previous state intact.
    */
  def merge(delta: DataFrame, path: String): Unit = {
    val spark = delta.sparkSession
    val merged = combine(spark.read.parquet(path), partials(delta))
    val tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path))
  }

  /** Read the state to final values (distinct via the HLL estimate). */
  def read(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame =
    spark.read.parquet(path)
      .select(col("g"), col("n"), col("s").cast("double").as("total"),
        col("mn"), col("mx"),
        hll_sketch_estimate(col("hll")).as("approx_distinct"))

  /** The marker carrying the last merged batch id. Underscore-prefixed
    * so parquet readers ignore it, and written INTO the tmp dir BEFORE
    * the swap — the rename that commits the data commits the marker in
    * the same atomic step, which is what makes [[mergeOnce]] safe
    * against a crash between "state written" and "progress recorded"
    * (the gap a separate side-file would leave).
    */
  private val Marker = "_committed_batch"

  /** Last batch id committed into the state, −1 if none recorded. */
  def committedBatch(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fp = new org.apache.hadoop.fs.Path(path, Marker)
    val fs = fp.getFileSystem(hconf)
    if (!fs.exists(fp)) -1L
    else {
      val in = fs.open(fp)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeMarker(spark: org.apache.spark.sql.SparkSession,
      dir: String, batchId: Long): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fp = new org.apache.hadoop.fs.Path(dir, Marker)
    val out = fp.getFileSystem(hconf).create(fp, true)
    try out.write(batchId.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Idempotent merge: a batch at or below the committed id is a
    * REPLAY (foreachBatch re-invocation after a crash before the
    * checkpoint commit — the at-least-once face) and is skipped, so
    * sums never double-count. First batch initializes.
    */
  def mergeOnce(delta: DataFrame, path: String, batchId: Long): Unit = {
    val spark = delta.sparkSession
    if (batchId <= committedBatch(spark, path)) ()
    else {
      val hconf = spark.sparkContext.hadoopConfiguration
      val pp = new org.apache.hadoop.fs.Path(path)
      val fs = pp.getFileSystem(hconf)
      val merged =
        if (!fs.exists(pp)) partials(delta)
        else combine(spark.read.parquet(path), partials(delta))
      val tmp = path + ".tmp"
      merged.write.mode("overwrite").parquet(tmp)
      writeMarker(spark, tmp, batchId)
      fs.delete(pp, true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), pp)
    }
  }

  /** Wire a (g, v, u) stream into the maintenance loop — exactly-once
    * state effects over an at-least-once foreachBatch, via the
    * batch-id marker swapped atomically with the data.
    */
  def stream(input: DataFrame, path: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeOnce(batch, path, batchId)
      }
      .start()

  /** q147 — the maintenance loop END TO END as a query: the events
    * table is split into 4 deterministic batches (event_id % 4 — an
    * arrival slicing), the state store is initialized from batch 0 and
    * merged 3 times, and the READ-BACK exact columns are the output.
    * The oracle is a plain GROUP BY over the full table — the merge
    * path must reproduce it exactly (the HLL column is spec-territory:
    * DuckDB can't replay DataSketches, and its accuracy/union
    * consistency is asserted in MaterializedAggSpec).
    */
  val q147 = GraftQuery(
    "q147_materialized_agg", {
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type").as("g"), col("value").as("v"),
            col("user_id").as("u"), col("event_id"))
        val path = java.nio.file.Files
          .createTempDirectory("q147-state").toString + "/state"
        init(ev.filter(col("event_id") % 4 === 0), path)
        (1 to 3).foreach(b =>
          merge(ev.filter(col("event_id") % 4 === b), path))
        read(s, path)
          .select(col("g"), col("n"),
            round(col("total"), 2).as("total_r"), col("mn"), col("mx"))
          .orderBy(col("g"))
      }
    },
    Some("""
      SELECT event_type AS g, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_r,
             min(value) AS mn, max(value) AS mx
      FROM events
      GROUP BY event_type
      ORDER BY g
    """))

  val all: Seq[GraftQuery] = Seq(q147)
}
