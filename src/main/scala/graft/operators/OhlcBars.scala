package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X149 — OHLC time-bar resampling (the candlestick/bar aggregation
  * every monitoring and market-data warehouse runs): collapse an
  * event stream to per-(series, day) bars — open/close = the value at
  * the first/last event under the TOTAL arrival order (ts, event_id),
  * high/low = extremes, volume = count, amount = exact decimal sum.
  * The irregular-stream sibling of X128's gap-fill (gap-fill
  * regularizes the grid; bars summarize within it).
  *
  * Determinism: open/close are selected by row_number over the
  * (ts, event_id) total order — event_id breaks timestamp ties
  * identically on both engines (DuckDB's arg_min lacks composite
  * ordering, so the window IS the portable form); high/low are exact
  * double comparisons on raw values; amount is a DECIMAL(18,2) sum.
  *
  * Scale shape: two row_number windows partitioned by (series, day) —
  * at production bar widths each partition is one series-day, so the
  * sort is local and bounded; then ONE map-side-combined groupBy to
  * the |series × days| frame.
  */
object OhlcBars {

  /** q190 — daily OHLC bars per event type. */
  val q190 = GraftQuery(
    "q190_ohlc_bars", {
      (s, d) => {
        val wAsc = Window.partitionBy(col("g"), col("day"))
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window.partitionBy(col("g"), col("day"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, d, "events")
          .select(col("event_type").as("g"),
            // rendered day (not DATE): Spark dumps DATE as a python
            // date object while DuckDB's lands as datetime64 — the
            // ISO string is the type both engines hash identically
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("ts"), col("event_id"), col("value"))
          .withColumn("rn", row_number().over(wAsc))
          .withColumn("rnd", row_number().over(wDesc))
          .groupBy(col("g"), col("day"))
          .agg(max(when(col("rn") === 1, col("value"))).as("open"),
            max(when(col("rnd") === 1, col("value"))).as("close"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            count(lit(1)).as("volume"),
            dsum(col("value")).as("amount"))
          .orderBy(col("g"), col("day"))
      }
    },
    Some("""
      WITH ev AS (
        SELECT event_type AS g, strftime(ts, '%Y-%m-%d') AS day, ts,
               event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                 strftime(ts, '%Y-%m-%d')
                 ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                 strftime(ts, '%Y-%m-%d')
                 ORDER BY ts DESC, event_id DESC) AS rnd
        FROM events)
      SELECT g, day,
             MAX(CASE WHEN rn = 1 THEN value END) AS open,
             MAX(CASE WHEN rnd = 1 THEN value END) AS close,
             MAX(value) AS high, MIN(value) AS low,
             COUNT(*) AS volume,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount
      FROM ev GROUP BY 1, 2 ORDER BY 1, 2
    """))

  val all: Seq[GraftQuery] = Seq(q190)
}
