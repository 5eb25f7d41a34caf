package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X116 — half-life-decayed event counts: the recency-weighted
  * aggregate behind trending detection and freshness-weighted mixing
  * (a crawl source's RECENT mass, not its lifetime mass, is what a
  * continually-trained model should sample by): per key,
  * decayed = Σ_events 2^(−age_days/halflife) with halflife = 1 day —
  * an event today counts 1, yesterday ½, a week ago 1/128.
  *
  * The determinism trick that makes an exponential-decay sum
  * hash-exact where exp/pow are not (neither is IEEE
  * correctly-rounded, and a float Σ is partition-order-dependent):
  * with INTEGER day ages, every weight is a power of two — so each
  * event's weight is the exact LONG 2^(H−1−age), the per-key sum is
  * exact integer arithmetic under any partitioning, and ONE final
  * division by 2^(H−1) (exact: a power-of-two divide only moves the
  * exponent) yields the decayed value. Events older than the H=62-day
  * horizon weigh 0 (their true weight is < 2.2e−19 — below double
  * resolution against any day-0 event, so the cutoff is lossless in
  * the rendered output).
  *
  * Scale shape: one map-side-combined groupBy(event_type) — the same
  * cost as a plain count; the reference day is one 1-row agg broadcast
  * unhinted. The STREAMING form is X98 state with (w_sum·2^(−Δdays))
  * folded at merge time — same exactness argument, documented here.
  */
object DecayedCounts {

  /** Horizon in days: ages ≥ H weigh 0 (2^(1−H) < double resolution
    * vs a day-0 event); H−1 = 61 keeps 2^(H−1) inside a long.
    */
  val H = 62

  /** Decayed counts over a frame of (event_type, age) rows — age in
    * whole days from the reference day.
    */
  def decayed(aged0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val aged = aged0
      .withColumn("w", when(col("age") >= H, 0L).otherwise(
        expr(s"shiftleft(CAST(1 AS BIGINT), ${H - 1} - age)")))
    // per-event weights reach 2^61, so the per-key sum must be
    // exact DECIMAL(38,0) (ANSI long sum would overflow at ~128
    // day-0 events); decimal addition is associative, and the one
    // decimal→double cast is correctly rounded on both engines
    aged.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("w").cast("decimal(38,0)")).as("w_sum"))
          .select(col("event_type"), col("n_events"),
            round(col("w_sum").cast("double") /
              lit((1L << (H - 1)).toDouble), 6).as("decayed_r"),
            round(col("w_sum").cast("double") /
              lit((1L << (H - 1)).toDouble) /
              col("n_events").cast("double"), 6).as("recency_r"))
          .orderBy(col("event_type"))
  }

  /** q161 — per-event-type decayed counts against the corpus's last
    * event day.
    */
  val q161 = GraftQuery(
    "q161_decayed_counts", {
      (s, d) => {
        val ev = t(s, d, "events")
        val ref = ev.agg(max(to_date(col("ts"))).as("refd"))
        decayed(ev.join(broadcast(ref))
          .withColumn("age", datediff(col("refd"), to_date(col("ts"))))
          .select(col("event_type"), col("age")))
      }
    },
    Some(s"""
      WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS refd FROM events),
      aged AS (
        SELECT e.event_type,
               datediff('day', CAST(e.ts AS DATE), r.refd) AS age
        FROM events e CROSS JOIN ref r),
      weighted AS (
        SELECT event_type,
               CASE WHEN age >= $H THEN CAST(0 AS BIGINT)
                    ELSE CAST(1 AS BIGINT) << (${H - 1} - age) END AS w
        FROM aged)
      -- SUM(BIGINT) is HUGEINT in DuckDB — exact like Spark's
      -- DECIMAL(38,0) sum; one correctly-rounded cast to DOUBLE each
      SELECT event_type, COUNT(*) AS n_events,
             round(CAST(SUM(w) AS DOUBLE)
                   / ${(1L << (H - 1)).toDouble}, 6) AS decayed_r,
             round(CAST(SUM(w) AS DOUBLE)
                   / ${(1L << (H - 1)).toDouble}
                   / CAST(COUNT(*) AS DOUBLE), 6) AS recency_r
      FROM weighted
      GROUP BY event_type
      ORDER BY event_type
    """))

  val all: Seq[GraftQuery] = Seq(q161)
}
