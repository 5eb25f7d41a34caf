package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MaterializedAgg

/** X192 — streaming maintenance of the X190 DAU/WAU/MAU dashboard:
  * the engagement vitals kept current per ingest batch. The key
  * observation making the STRONG parity contract available: q227 is
  * a pure function of the distinct (user, day) activity ledger, and
  * a DISTINCT SET is the ultimate commutative merge (union then
  * dedup) — so the maintained state IS that ledger, each batch folds
  * in via [[graft.operators.MaterializedAgg.mergeOnceAs]] (one
  * map-side delta distinct + a state-sized union-dedup), and the
  * window censuses run at READ time. ARBITRARY batch slicing — any
  * order, any split, duplicates across batches — reproduces batch
  * q227 bit-for-bit, because set union commutes and absorbs.
  *
  * State is |user-days| rows — the activity ledger itself, the
  * minimal state ANY exact distinct-active dashboard carries
  * (stated; the approximate path at 100 TB is one X44 HLL sketch per
  * day, mergeable the same way, traded in SURVEY §2.8's sketch tier).
  */
object ActiveUsersStream {

  /** Delta batch (user_id, ts) → distinct user-day partials. */
  def toPartials(delta: DataFrame): DataFrame =
    delta.select(col("user_id"),
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
        .cast("long").as("day"))
      .distinct()

  /** Commutative, absorbing merge of two ledgers. */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    MaterializedAgg.mergeOnceAs(delta, path, batchId, toPartials,
      combine)

  /** Read the maintained dashboard back — q227's computation over the
    * maintained ledger, column-for-column.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    val userDays = spark.read.parquet(path)
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = userDays
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    val mau = userDays
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 29)).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("mau"))
    dau.join(wau, Seq("day")).join(mau, Seq("day"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("mau").cast("double"))
      .withColumn("date", timestamp_seconds(col("day") * 86400L))
      .select(col("date"), col("dau"), col("wau"), col("mau"),
        col("stickiness"))
      .orderBy(col("date"))
  }
}
