package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X165 — streaming maintenance of the X143 CUSUM change-point census:
  * the ingest-health detector kept current per batch. The key
  * observation making this CHEAP and exactly-once: q184 is a pure
  * function of the |types × hours| hourly-count frame, and hourly
  * counts are a COMMUTATIVE merge (per-(type, hour) sums) — so the
  * maintained STATE is that dimension frame, each batch folds in via
  * [[graft.operators.MaterializedAgg.mergeOnceAs]] (one map-side delta
  * groupBy + a state-sized union-merge), and the CUSUM
  * windows/argmin run at READ time on the state frame (dimension-
  * sized — hours grow with wall time, not volume). The parity contract
  * is the STRONG X98/X158 one: ARBITRARY batch slicing reproduces the
  * batch q184 census bit-for-bit, because addition commutes — no
  * in-order discipline needed, unlike X140's lateness fold.
  *
  * This is the standing pattern for maintaining ANY of the
  * hours-frame statistics (X143 CUSUM, X162 stability, X164
  * seasonal-naive): state = the dimension frame, detector = the
  * read-time window pass.
  */
object ChangePointStream {

  /** Delta batch (event_type, ts) → hourly partial counts. */
  def toPartials(delta: DataFrame): DataFrame =
    delta.groupBy(col("event_type").as("g"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))

  /** Commutative merge of two hourly-count frames. */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("g"), col("h"))
      .agg(sum(col("x")).as("x"))

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    graft.operators.MaterializedAgg.mergeOnceAs(delta, path, batchId,
      toPartials, combine)

  /** Read the maintained census back — q184's exact computation over
    * the maintained hours frame, column-for-column.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    graft.operators.MaterializedAgg.recover(spark, path)
    val hourly = spark.read.parquet(path)
    val wAll = Window.partitionBy(col("g"))
    val wPre = Window.partitionBy(col("g")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("hh", count(lit(1)).over(wAll))
      .withColumn("tt", sum(col("x")).over(wAll))
      .withColumn("p", sum(col("x") * col("hh") - col("tt")).over(wPre))
      .withColumn("cusum",
        col("p") - least(lit(0L), min(col("p")).over(wPre)))
      .withColumn("mp", min(col("p")).over(wAll))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("x")).as("n_events"),
        max(col("cusum")).as("max_cusum"),
        min(when(col("p") === col("mp"), col("h"))).as("change_hour"))
      .orderBy(col("g"))
  }
}
