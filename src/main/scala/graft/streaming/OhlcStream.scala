package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** X158 — streaming maintenance of the X149 OHLC bars: the candlestick
  * dashboard kept current per ingest batch, never a rescan. Unlike
  * X140's sequential fold, an OHLC bar is a COMMUTATIVE merge — every
  * component is an associative/commutative statistic over exact values
  * (open/close = argmin/argmax under the (us, event_id) total order,
  * carried as (us, id, value) triples; high/low = extremes; volume =
  * count; amount = exact DECIMAL sum) — so this rides
  * [[graft.operators.MaterializedAgg.mergeOnceAs]] (the X98 machinery)
  * and the parity contract is the STRONG one: ARBITRARY batch slicing
  * — not just chronological — reproduces the batch q190 bars
  * bit-for-bit (the spec slices round-robin to prove order
  * independence), plus replay idempotence and kill+restart recovery
  * over the X71 source.
  *
  * Scale: per batch ONE map-side-combined groupBy of the DELTA to its
  * |series × days| partials + a same-sized state union-merge. The
  * amount column is pinned DECIMAL(38,2) so the state schema is stable
  * across merges (Spark widens decimal sums per aggregation level).
  */
object OhlcStream {

  private val Dec382 = DecimalType(38, 2)

  /** Delta batch (event_type, ts, event_id, value) → mergeable bar
    * partials, one row per (series, day).
    */
  def toPartials(delta: DataFrame): DataFrame =
    delta.select(col("event_type").as("g"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr("unix_micros(ts)").as("us"), col("event_id"), col("value"))
      .groupBy(col("g"), col("day"))
      .agg(min(struct(col("us"), col("event_id"), col("value"))).as("o"),
        max(struct(col("us"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("volume"),
        sum(col("value").cast(DecimalType(18, 2))).cast(Dec382)
          .as("amount"))
      .select(col("g"), col("day"),
        col("o.us").as("o_us"), col("o.event_id").as("o_id"),
        col("o.value").as("open"),
        col("c.us").as("c_us"), col("c.event_id").as("c_id"),
        col("c.value").as("close"),
        col("high"), col("low"), col("volume"), col("amount"))

  /** Commutative merge of two partial-bar frames. */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("g"), col("day"))
      .agg(min(struct(col("o_us"), col("o_id"), col("open"))).as("o"),
        max(struct(col("c_us"), col("c_id"), col("close"))).as("c"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        sum(col("volume")).as("volume"),
        sum(col("amount")).cast(Dec382).as("amount"))
      .select(col("g"), col("day"),
        col("o.o_us").as("o_us"), col("o.o_id").as("o_id"),
        col("o.open").as("open"),
        col("c.c_us").as("c_us"), col("c.c_id").as("c_id"),
        col("c.close").as("close"),
        col("high"), col("low"), col("volume"), col("amount"))

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    graft.operators.MaterializedAgg.mergeOnceAs(delta, path, batchId,
      toPartials, combine)

  /** Read the maintained bars back, rendered like q190's columns. */
  def read(spark: SparkSession, path: String): DataFrame = {
    graft.operators.MaterializedAgg.recover(spark, path)
    spark.read.parquet(path)
      .select(col("g"), col("day"), col("open"), col("close"),
        col("high"), col("low"), col("volume"),
        col("amount").cast("double").as("amount"))
      .orderBy(col("g"), col("day"))
  }
}
