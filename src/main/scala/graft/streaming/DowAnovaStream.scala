package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DowAnova, MaterializedAgg}

/** X207 — streaming maintenance of the X203 weekday-ANOVA dashboard:
  * the seasonality monitor kept current per ingest batch. The state
  * is the (type, dow) sufficient-statistics frame — n, Σx, Σx² per
  * weekday cell (≤ 7 rows per type, the minimal state ANY variance
  * decomposition carries) — and because SUMS COMMUTE AND ASSOCIATE
  * the merge rides [[MaterializedAgg.mergeOnceAs]] with the STRONG
  * contract of the maintenance tier: ARBITRARY day-complete slicing —
  * any order, any split across batches — reproduces batch q238
  * bit-for-bit (only day-completeness is required, since a day split
  * across two batches would enter the daily-count census twice;
  * stated — the X204 caveat, but with no chronology requirement at
  * all). read() re-runs q238's fixed double tree over the merged
  * cells, column-for-column.
  */
object DowAnovaStream {

  /** Delta batch (event_type, ts) → per-(type, dow) partials. */
  def toPartials(delta: DataFrame): DataFrame =
    delta.groupBy(col("event_type").as("g"),
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
        .cast("long").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", pmod(col("day"), lit(7L)))
      .groupBy(col("g"), col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))

  /** Commutative, associative merge of two cell frames. */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("g"), col("dow"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"))

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    MaterializedAgg.mergeOnceAs(delta, path, batchId, toPartials,
      combine)

  /** q238 from the maintained cells — the same fixed double tree. */
  def read(spark: SparkSession, path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    val cells = spark.read.parquet(path)
    val aggs =
      Seq(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2")) ++
      (0 to 6).flatMap { dd =>
        Seq(sum(when(col("dow") === dd, col("n")).otherwise(0L))
          .as(s"n_$dd"),
          sum(when(col("dow") === dd, col("s1")).otherwise(0L))
            .as(s"s_$dd"))
      }
    val terms = (0 to 6).map(d =>
      s"(case when n_$d > 0 then cast(s_$d * s_$d as double) " +
        s"/ cast(n_$d as double) else 0.0 end)").mkString(" + ")
    cells.groupBy(col("g"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("groups_sum", expr(terms))
      .withColumn("sst", expr(
        "cast(s2 as double) - cast(s1 as double) * " +
          "cast(s1 as double) / cast(n as double)"))
      .withColumn("ssb", expr(
        "groups_sum - cast(s1 as double) * cast(s1 as double) " +
          "/ cast(n as double)"))
      .withColumn("ssw", expr("cast(s2 as double) - groups_sum"))
      .withColumn("k_eff", expr(
        (0 to 6).map(dd => s"(case when n_$dd > 0 then 1 else 0 end)")
          .mkString(" + ")))
      .withColumn("strength", expr(
        "case when sst != 0.0 then ssb / sst end"))
      .withColumn("f_stat", expr(
        "case when k_eff = 7 and n > 7 and ssw != 0.0 then " +
          "(ssb / 6.0) / (ssw / cast(n - 7 as double)) end"))
      .withColumn("seasonal",
        when(col("f_stat").isNotNull, col("f_stat") > DowAnova.F95))
      .select(col("g"), col("n").as("n_days"), col("k_eff"),
        col("strength"), col("f_stat"), col("seasonal"))
      .orderBy(col("g"))
  }
}
