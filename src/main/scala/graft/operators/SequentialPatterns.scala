package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X170 — sequential pattern mining, the length-2 core (Agrawal &
  * Srikant ICDE'95; Pei et al.'s PrefixSpan ICDE'01 generalizes the
  * same support counting): for every ordered pair of event types
  * (a THEN b — a occurs strictly before b inside one session), the
  * number of supporting sessions and the confidence against sessions
  * containing a at all. X125 ranks UNORDERED co-occurrence in baskets;
  * this is its order-aware sibling on the clickstream — "search then
  * purchase" and "purchase then search" are different patterns here
  * and the same basket there. The funnel/X101 precursor that does not
  * need the steps declared up front: it DISCOVERS the ordered pairs.
  *
  * Support counting trick that keeps everything exact and
  * session-bounded: a session supports (a → b) iff FIRST(a) <
  * LAST(b) in the session's total order (ts, event_id) — existence of
  * any a-before-b occurrence is equivalent, so per session only the
  * |types|-row (first_rn, last_rn) summary ever joins, never the raw
  * events. The pair face is Σ |types-per-session|² ≤ 64·sessions on
  * this schema's 8 event types — linear in sessions with a constant
  * bound, NOT in events².
  *
  * Scale shape: the q35 session cut (two user-partitioned windows —
  * shared exchange with every other session query), one groupBy to
  * the per-session type summary, one session-key self-join of that
  * bounded frame, two map-side count aggregations, and a broadcast
  * join of the |types|-row marginals. Confidence = one double
  * division of two exact longs (cross-engine bit-identical).
  */
object SequentialPatterns {

  /** Ordered-pair support over an (user_id, ts, event_id, event_type)
    * frame. Columns: ty_a, ty_b, support, sessions_with_a, confidence.
    */
  def patterns(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val newSession = when(
          col("ts").cast("double") -
            lag(col("ts"), 1).over(byUser).cast("double") > 1800d ||
            lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0)
        val sess = events
          .withColumn("is_new", newSession)
          .withColumn("session_id", sum(col("is_new")).over(byUser
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"), col("session_id"))
              .orderBy(col("ts"), col("event_id"))))
        // per (session, type): first and last position — the whole
        // session collapses to ≤ 8 rows before any pairing.
        val typePos = sess
          .groupBy(col("user_id"), col("session_id"),
            col("event_type").as("ty"))
          .agg(min(col("rn")).as("first_rn"), max(col("rn")).as("last_rn"))
        val support = typePos.as("a")
          .join(typePos.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.session_id") === col("b.session_id") &&
              col("a.ty") =!= col("b.ty") &&
              col("a.first_rn") < col("b.last_rn"))
          .groupBy(col("a.ty").as("ty_a"), col("b.ty").as("ty_b"))
          .agg(count(lit(1)).as("support"))
        val withA = typePos.groupBy(col("ty").as("ty_a"))
          .agg(count(lit(1)).as("sessions_with_a"))
        support.join(broadcast(withA), "ty_a")
          .select(col("ty_a"), col("ty_b"), col("support"),
            col("sessions_with_a"),
            (col("support").cast("double") /
              col("sessions_with_a").cast("double")).as("confidence"))
          .orderBy(col("support").desc, col("ty_a"), col("ty_b"))
  }

  /** q209 — ordered event-type pairs by session support. */
  val q209 = GraftQuery(
    "q209_sequential_patterns",
    (s, d) => patterns(t(s, d, "events")),
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch(ts) - epoch(LAG(ts, 1) OVER w) > 1800
                      OR LAG(ts, 1) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id,
               ts, event_id
        FROM flagged),
      pos AS (
        SELECT user_id, session_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                 ORDER BY ts, event_id) AS rn
        FROM sess),
      type_pos AS (
        SELECT user_id, session_id, event_type AS ty,
               MIN(rn) AS first_rn, MAX(rn) AS last_rn
        FROM pos GROUP BY 1, 2, 3),
      support AS (
        SELECT a.ty AS ty_a, b.ty AS ty_b, COUNT(*) AS support
        FROM type_pos a JOIN type_pos b
          ON a.user_id = b.user_id AND a.session_id = b.session_id
         AND a.ty <> b.ty AND a.first_rn < b.last_rn
        GROUP BY 1, 2),
      with_a AS (
        SELECT ty AS ty_a, COUNT(*) AS sessions_with_a
        FROM type_pos GROUP BY 1)
      SELECT s.ty_a, s.ty_b, s.support, w.sessions_with_a,
             CAST(s.support AS DOUBLE) / CAST(w.sessions_with_a AS DOUBLE)
               AS confidence
      FROM support s JOIN with_a w ON s.ty_a = w.ty_a
      ORDER BY support DESC, s.ty_a, ty_b
    """))

  val all: Seq[GraftQuery] = Seq(q209)
}
