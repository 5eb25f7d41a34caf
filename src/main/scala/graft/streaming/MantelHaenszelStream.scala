package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MantelHaenszel, MaterializedAgg}

/** X238 — streaming maintenance of the X229 stratified A/B: the
  * Mantel–Haenszel pooled odds ratio + RBG CI kept current per order
  * batch, so a LIVE experiment dashboard reads the
  * confounder-adjusted effect without ever re-scanning the ledger.
  * State = the per-month 2×2 cell frame ([[MantelHaenszel.cells]] —
  * the SAME frame q261's first groupBy produces, and the minimal
  * sufficient statistic for the estimator: every MH/RBG term is a
  * function of (a, b, c, d) per stratum). Cells are sums — they
  * COMMUTE AND ASSOCIATE — so the merge rides
  * [[MaterializedAgg.mergeOnceAs]] with the STRONG contract:
  * ARBITRARY order slicing (any split, any arrival order) reproduces
  * batch q261 bit-for-bit.
  *
  * State size is |months| × 4 longs — wall-time-bounded (the X202
  * economics), independent of order volume.
  */
object MantelHaenszelStream {

  /** Delta batch of orders → mergeable per-month cells. */
  def toPartials(delta: DataFrame): DataFrame =
    MantelHaenszel.cells(delta)

  /** Commutative, associative merge of two cell frames. */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("mth"))
      .agg(sum(col("a")).as("a"), sum(col("b")).as("b"),
        sum(col("cc")).as("cc"), sum(col("dd")).as("dd"))

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    MaterializedAgg.mergeOnceAs(delta, path, batchId, toPartials,
      combine)

  /** q261 from the maintained cells — the same pooled tree. */
  def read(spark: SparkSession, path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    MantelHaenszel.pooled(spark.read.parquet(path))
  }
}
