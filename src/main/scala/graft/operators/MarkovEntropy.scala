package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X257 — Markov entropy rate of the event-type flow (Shannon 1948,
  * §II.7: H = −Σᵢ πᵢ Σⱼ pᵢⱼ log pᵢⱼ for a Markov source): how
  * PREDICTABLE is the next event given the current one — the single
  * number that prices the whole X39 transition matrix. H near 0
  * means the flow is near-deterministic (prefetch/precompute the
  * next screen, a funnel narrative is warranted); H near ln k means
  * the chain adds nothing over the stationary mix. Reported with
  * H_max = ln(#states) and the predictability ratio 1 − H/H_max —
  * the normalized dial a dashboard can threshold, and the entropy
  * companion to q280's symmetry verdict on the same chain.
  *
  * π is the EMPIRICAL source-state frequency (row marginals over
  * total transitions) — the observed-flow convention, stated: πᵢpᵢⱼ
  * then simplifies to cᵢⱼ/N, so H = −Σᵢⱼ (cᵢⱼ/N)·ln(cᵢⱼ/cᵢ) and
  * every leaf is an exact long.
  *
  * Determinism: successor pairing is the shared (user, ts, event_id)
  * lag chain (the X39/q280 window); the ≤k² cell census is eagerly
  * materialized (three consumers — row marginals, total, terms — the
  * q240 discipline); each cell's term is ONE double tree over exact
  * longs, summed on DECIMAL(30,14) lanes; single-state chains →
  * NULL predictability (H_max = 0).
  *
  * Scale shape: one user-partitioned lag window over the corpus →
  * map-side-combined ≤k² cells (eager) → ≤k-row re-aggs → a 1-row
  * fold. Corpus touched once.
  */
object MarkovEntropy {

  /** q288 — entropy rate + predictability of the event-type chain. */
  val q288 = GraftQuery(
    "q288_markov_entropy", {
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val cells = graft.Checkpoints.eager(t(s, d, "events")
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("a"), col("nxt").as("b"))
          .agg(count(lit(1)).as("c")))
        val rows = cells.groupBy(col("a")).agg(sum(col("c")).as("ca"))
        val totals = cells.agg(sum(col("c")).as("nn"),
          countDistinct(col("a")).as("k"))
        cells.join(broadcast(rows), "a").join(broadcast(totals))
          .withColumn("term",
            col("c").cast("double") / col("nn").cast("double") *
              log(col("c").cast("double") / col("ca").cast("double")))
          .groupBy()
          .agg(max(col("nn")).as("n_transitions"),
            max(col("k")).as("n_states"),
            (-sum(col("term").cast("decimal(30,14)")).cast("double"))
              .as("h"))
          .withColumn("h_max",
            log(col("n_states").cast("double")))
          .select(col("n_transitions"), col("n_states"),
            round(col("h"), 6).as("h_rate_r"),
            round(col("h_max"), 6).as("h_max_r"),
            when(col("n_states") > 1L,
              round(lit(1.0d) - col("h") / col("h_max"), 6))
              .as("predictability_r"))
      }
    },
    Some(s"""
      WITH chain AS (
        SELECT event_type AS a,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS b
        FROM events),
      cells AS (
        SELECT a, b, COUNT(*) AS c
        FROM chain WHERE b IS NOT NULL GROUP BY a, b),
      rows_ AS (
        SELECT a, CAST(SUM(c) AS BIGINT) AS ca FROM cells GROUP BY a),
      totals AS (
        SELECT CAST(SUM(c) AS BIGINT) AS nn,
               COUNT(DISTINCT a) AS k
        FROM cells),
      folded AS (
        SELECT MAX(t.nn) AS n_transitions, MAX(t.k) AS n_states,
               -CAST(SUM(CAST(
                 CAST(c.c AS DOUBLE) / CAST(t.nn AS DOUBLE)
                   * ln(CAST(c.c AS DOUBLE) / CAST(r.ca AS DOUBLE))
                 AS DECIMAL(30,14))) AS DOUBLE) AS h
        FROM cells c
        JOIN rows_ r ON r.a = c.a
        CROSS JOIN totals t)
      SELECT n_transitions, n_states,
             round(h, 6) AS h_rate_r,
             round(ln(CAST(n_states AS DOUBLE)), 6) AS h_max_r,
             CASE WHEN n_states > 1 THEN
               round(1.0 - h / ln(CAST(n_states AS DOUBLE)), 6)
             END AS predictability_r
      FROM folded
    """))

  val all: Seq[GraftQuery] = Seq(q288)
}
