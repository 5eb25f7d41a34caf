package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X152 — maximum drawdown over cumulative value paths (the risk
  * statistic of Magdon-Ismail & Atiya, "Maximum drawdown", Risk 17(10)
  * 2004, computed exactly rather than via their asymptotics): per
  * series, the deepest peak-to-trough fall of the running total — the
  * ops-dashboard question "how far below its best has this feed's
  * cumulative volume/revenue fallen, and when" that a plain min/max
  * pair cannot answer (a drawdown is ORDER-dependent: the trough must
  * come AFTER the peak).
  *
  * Formulation: per event_type, equity path P_t = prefix sum of the
  * exact DECIMAL(18,2) value in (ts, event_id) order (total order —
  * ties impossible past the unique id), running peak M_t = prefix max
  * of P, drawdown D_t = M_t − P_t ≥ 0; the report row per series is
  * the FIRST row attaining the maximum drawdown (row_number over
  * D desc, ts, event_id — a total order, so argmax ties are
  * deterministic), carrying the trough location, the peak it fell
  * from, and the end-of-series equity. All arithmetic is decimal —
  * exact and associative, so partitioning cannot move a bit; doubles
  * appear only in the final render cast.
  *
  * Scale shape: two prefix windows and one ranking window, all
  * partitioned by the series key — per-series local sorts, no global
  * shuffle beyond the series hash; output = |series| rows. A single
  * 100 TB series takes the q149 two-level prefix swap (range-bucket,
  * per-bucket partials, |buckets| prefix).
  */
object MaxDrawdown {

  /** q193 — per-type max drawdown census over the event value path. */
  val q193 = GraftQuery(
    "q193_max_drawdown", {
      (s, d) => {
        val wPre = Window.partitionBy(col("g"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("g"))
        val wPick = Window.partitionBy(col("g"))
          .orderBy(col("dd").desc, col("ts"), col("event_id"))
        t(s, d, "events")
          .select(col("event_type").as("g"), col("ts"), col("event_id"),
            dec(col("value")).as("v"))
          .withColumn("p", sum(col("v")).over(wPre))
          .withColumn("m", max(col("p")).over(wPre))
          .withColumn("dd", col("m") - col("p"))
          .withColumn("n_events", count(lit(1)).over(wAll))
          .withColumn("final_equity", sum(col("v")).over(wAll))
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("g"), col("n_events"),
            col("final_equity").cast("double").as("final_equity"),
            col("dd").cast("double").as("max_drawdown"),
            col("m").cast("double").as("peak_equity"),
            col("ts").as("trough_ts"), col("event_id").as("trough_event"))
          .orderBy(col("g"))
      }
    },
    Some("""
      WITH path AS (
        SELECT event_type AS g, ts, event_id,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events),
      pre AS (
        SELECT g, ts, event_id,
               SUM(v) OVER w AS p,
               COUNT(*) OVER (PARTITION BY g) AS n_events,
               SUM(v) OVER (PARTITION BY g) AS final_equity
        FROM path
        WINDOW w AS (PARTITION BY g ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      dd AS (
        SELECT g, ts, event_id, p, n_events, final_equity,
               MAX(p) OVER w AS m,
               MAX(p) OVER w - p AS dd
        FROM pre
        WINDOW w AS (PARTITION BY g ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      pick AS (
        SELECT g, ts, event_id, n_events, final_equity, m, dd,
               ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY dd DESC, ts, event_id) AS rn
        FROM dd)
      SELECT g, n_events,
             CAST(final_equity AS DOUBLE) AS final_equity,
             CAST(dd AS DOUBLE) AS max_drawdown,
             CAST(m AS DOUBLE) AS peak_equity,
             ts AS trough_ts, event_id AS trough_event
      FROM pick WHERE rn = 1
      ORDER BY g
    """))

  val all: Seq[GraftQuery] = Seq(q193)
}
