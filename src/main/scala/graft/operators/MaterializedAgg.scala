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
