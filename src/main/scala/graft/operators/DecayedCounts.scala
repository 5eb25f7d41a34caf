package graft.operators

import org.apache.spark.sql.DataFrame
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
  * unhinted. The STREAMING form (X118, [[dayPartials]]/[[readDecayed]])
  * keeps the exact integer day histogram as X98 state — a decayed
  * FLOAT would truncate low bits on every 2^(−Δ) re-fold; the
  * histogram derivation is bit-identical to this batch form under any
  * slicing, with a lossless \|types\|·H-row horizon bound.
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
    // accepts per-event rows OR a pre-counted day histogram (column
    // `n` — the X118 state shape); weights scale by n in DECIMAL so
    // n·2^61 cannot overflow
    val withN =
      if (aged0.columns.contains("n")) aged0
      else aged0.withColumn("n", lit(1L))
    val aged = withN
      .withColumn("w", when(col("age") >= H, lit(0L).cast("decimal(38,0)"))
        .otherwise(col("n").cast("decimal(38,0)") *
          expr(s"shiftleft(CAST(1 AS BIGINT), ${H - 1} - age)")
            .cast("decimal(38,0)")))
    // per-event weights reach 2^61, so the per-key sum must be
    // exact DECIMAL(38,0) (ANSI long sum would overflow at ~128
    // day-0 events); decimal addition is associative, and the one
    // decimal→double cast is correctly rounded on both engines
    aged.groupBy(col("event_type"))
          .agg(sum(col("n")).as("n_events"),
            sum(col("w")).as("w_sum"))
          .select(col("event_type"), col("n_events"),
            round(col("w_sum").cast("double") /
              lit((1L << (H - 1)).toDouble), 6).as("decayed_r"),
            round(col("w_sum").cast("double") /
              lit((1L << (H - 1)).toDouble) /
              col("n_events").cast("double"), 6).as("recency_r"))
          .orderBy(col("event_type"))
  }

  // ---- X118: streaming maintenance (bounded per-day count state) --

  /** Per-batch partials for the STREAMING form: exact (event_type,
    * day, n) counts. The state never stores decayed floats — it stores
    * the integer day histogram the decay is DERIVED from at read time,
    * so the maintained value is bit-identical to the batch q161 over
    * the same absorbed events under any slicing (exact equality, a
    * stronger contract than the sketch tiers' bounds). State is
    * bounded at |types|·H rows: [[dayCombine]] prunes days ≥ H behind
    * the newest absorbed day, which is lossless — their weight is
    * exactly 0 against any reference ≥ that day, and merges only move
    * the reference forward.
    */
  def dayPartials(batch: DataFrame): DataFrame =
    batch.select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"))

  /** Combine two day-histogram frames: additive per (type, day) +
    * the lossless horizon prune.
    */
  def dayCombine(a: DataFrame, b: DataFrame): DataFrame = {
    val u = a.unionByName(b).groupBy(col("event_type"), col("d"))
      .agg(sum(col("n")).as("n"))
    val mx = u.agg(max(col("d")).as("mxd"))
    u.join(broadcast(mx))
      .filter(datediff(col("mxd"), col("d")) < H)
      .select(col("event_type"), col("d"), col("n"))
  }

  /** Merge one batch into the day-histogram state — exactly-once by
    * batch id (the X98 contract; swap/marker/recovery inherited).
    */
  def mergeDecayedOnce(batch: DataFrame, path: String,
      batchId: Long): Unit =
    MaterializedAgg.mergeOnceAs(batch, path, batchId, dayPartials,
      dayCombine)

  /** Read the maintained decayed counts — [[decayed]] over the state's
    * own day histogram (reference = newest absorbed day), weights
    * n·2^(H−1−age) exact.
    */
  def readDecayed(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    val st = spark.read.parquet(path)
    val ref = st.agg(max(col("d")).as("refd"))
    decayed(st.join(broadcast(ref))
      .withColumn("age", datediff(col("refd"), col("d")))
      .select(col("event_type"), col("age"), col("n")))
  }

  /** Wire a stream into the decayed-count maintenance loop. */
  def stream(input: DataFrame, path: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeDecayedOnce(batch, path, batchId)
      }
      .start()

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
