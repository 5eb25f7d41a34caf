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

  /** (user_id, day) projection shared by the exact and HLL tiers. */
  private def userDaysOf(delta: DataFrame): DataFrame =
    delta.select(col("user_id"),
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
        .cast("long").as("day"))

  /** Delta batch (user_id, ts) → distinct user-day partials. */
  def toPartials(delta: DataFrame): DataFrame =
    userDaysOf(delta).distinct()

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

  /** The approximate 100 TB tier (r17, VERDICT r16 item 6): state is
    * ONE DataSketches HLL sketch per day (|days| rows × ~KBs) instead
    * of the |user-days| exact ledger — the X44/q92 sketch column as
    * maintained state. The merge stays commutative and ABSORBING
    * (HLL union is an element-wise register max: order-insensitive,
    * idempotent under duplicate user-days), so the same
    * [[MaterializedAgg.mergeOnceAs]] machinery gives the same
    * arbitrary-slicing contract — only the read-out is an estimate
    * (relative standard error ≈ 1.04/√2^lgK ≈ 1.6 % at lgK = 12;
    * exact while a day's sketch is still in coupon mode). WAU/MAU at
    * read time are sketch UNIONS over the trailing 7/30-day windows —
    * the re-aggregation that makes this the honest 100 TB shape: a
    * month's MAU is a 30-sketch union, never a corpus re-scan.
    */
  object Hll {

    val LgK = 12

    /** Delta batch → per-day HLL sketch partials. */
    def toPartials(delta: DataFrame): DataFrame =
      userDaysOf(delta)
        .groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(LgK)).as("sk"))

    /** Commutative, absorbing merge: per-day register-max union. */
    def combine(a: DataFrame, b: DataFrame): DataFrame =
      a.unionByName(b)
        .groupBy(col("day"))
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))

    /** One exactly-once maintained apply of a delta batch. */
    def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
      MaterializedAgg.mergeOnceAs(delta, path, batchId, toPartials,
        combine)

    /** The q227 dashboard from the sketch-per-day state: DAU is the
      * day's own estimate; WAU/MAU estimate the UNION of the trailing
      * window's sketches (exploded forward like the exact tier, so a
      * day's sketch feeds the 7/30 window rows it belongs to).
      */
    def read(spark: SparkSession, path: String): DataFrame = {
      MaterializedAgg.recover(spark, path)
      val st = spark.read.parquet(path)
      def windowed(days: Int, name: String): DataFrame = st
        .select(explode(sequence(col("day"), col("day") + (days - 1)))
          .as("day"), col("sk"))
        .groupBy(col("day"))
        .agg(round(hll_sketch_estimate(
          hll_union_agg(col("sk"), lit(false)))).cast("long").as(name))
      val dau = st.select(col("day"),
        round(hll_sketch_estimate(col("sk"))).cast("long").as("dau"))
      dau.join(windowed(7, "wau"), Seq("day"))
        .join(windowed(30, "mau"), Seq("day"))
        .withColumn("stickiness",
          col("dau").cast("double") / col("mau").cast("double"))
        .withColumn("date", timestamp_seconds(col("day") * 86400L))
        .select(col("date"), col("dau"), col("wau"), col("mau"),
          col("stickiness"))
        .orderBy(col("date"))
    }
  }
}
