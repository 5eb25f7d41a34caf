package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X86 — event-transition matrix (first-order Markov over per-user
  * event streams): for every ordered pair of event types, how often
  * does one follow the other within a user's timeline, as counts and
  * row-normalized probabilities. The clickstream-analytics workhorse
  * (next-event prediction baselines, funnel-leak diagnosis — where do
  * users GO after `view` — and bot detection via improbable transition
  * signatures), and the behavioral complement of X51's fixed-pattern
  * matcher: q97 asks "did this exact path happen", the matrix asks
  * "what does the typical path look like".
  *
  * Determinism: successor pairing is a lag/lead window ordered by the
  * full (ts, event_id) key — event_id breaks timestamp ties, so the
  * pairing is total-ordered; probabilities use the established
  * micro-unit rounding (q111/q129 discipline): p_mu = (2·10⁶·n + tot)
  * div (2·tot), pure integer.
  *
  * Scale shape: ONE window partitioned by user_id (the natural
  * clickstream shard key — state per partition is one row), then a
  * map-side-combined groupBy over (from, to) — a |types|² frame. The
  * event payload (`props`) is projected away before the shuffle; the
  * only corpus-sized exchange carries (user, ts, event_id, type).
  */
object TransitionMatrix {

  /** q137 — 5×5 transition matrix over the events table. */
  val q137 = GraftQuery(
    "q137_event_transitions", {
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"))
          .withColumn("to_type", lead(col("from_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
        val counts = pairs.groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = counts.groupBy(col("from_type"))
          .agg(sum(col("n")).as("tot"))
        counts.join(totals, "from_type")
          .withColumn("__mu", expr("(2000000 * n + tot) div (2 * tot)"))
          .select(col("from_type"), col("to_type"), col("n"),
            (col("__mu").cast("double") / 1000000.0d).as("p_r"))
          .orderBy(col("from_type"), col("to_type"))
      }
    },
    Some("""
      WITH ordered AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
        FROM events),
      pairs AS (SELECT from_type, to_type FROM ordered
                WHERE to_type IS NOT NULL),
      counts AS (
        SELECT from_type, to_type, count(*) AS n
        FROM pairs GROUP BY 1, 2),
      totals AS (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
        FROM counts GROUP BY 1)
      SELECT c.from_type, c.to_type, c.n,
             CAST((2000000 * c.n + t.tot) // (2 * t.tot) AS DOUBLE)
               / 1000000.0 AS p_r
      FROM counts c JOIN totals t USING (from_type)
      ORDER BY c.from_type, c.to_type
    """))

  val all: Seq[GraftQuery] = Seq(q137)
}
