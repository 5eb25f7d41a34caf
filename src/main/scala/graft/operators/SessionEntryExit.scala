package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X195 — session entry/exit matrix (the landing/exit-page analysis
  * of web analytics, on event types): per (first event type, last
  * event type) the session count, single-event BOUNCE count, and
  * mean session length — which doors users come in through, which
  * they leave by, and whether the journey between them exists at
  * all. The census complements X175 (whole paths, top-k) with the
  * complete boundary matrix (≤ |types|² rows, nothing truncated),
  * and q35/X19 (session stats keyed by user) with a session census
  * keyed by SHAPE.
  *
  * Determinism: entry/exit are the first/last rows of the session's
  * (ts, event_id) total order; a one-event session is a bounce by
  * definition (entry = exit, stated); mean length = one double
  * division of exact longs.
  *
  * Scale shape: the q35 session cut (shared exchange), entry/exit
  * picked by min/max over (rn, type) structs in the SAME session
  * groupBy that counts events — one aggregation, no extra window —
  * then a map-side census to the ≤ |types|² matrix.
  */
object SessionEntryExit {

  /** q231 — the entry × exit census. */
  val q231 = GraftQuery(
    "q231_session_entry_exit", {
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val newSession = when(
          col("ts").cast("double") -
            lag(col("ts"), 1).over(byUser).cast("double") > 1800d ||
            lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0)
        val sess = t(s, d, "events")
          .withColumn("session_id", sum(newSession).over(byUser
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"), col("session_id"))
              .orderBy(col("ts"), col("event_id"))))
        val perSession = sess
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(struct(col("rn"), col("event_type"))).as("first"),
            max(struct(col("rn"), col("event_type"))).as("last"))
          .select(col("first.event_type").as("entry"),
            col("last.event_type").as("exit"), col("n_events"))
        perSession.groupBy(col("entry"), col("exit"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L))
              .as("n_bounce"),
            sum(col("n_events")).as("total_events"))
          .withColumn("mean_events",
            col("total_events").cast("double") /
              col("n_sessions").cast("double"))
          .orderBy(col("entry"), col("exit"))
      }
    },
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
      per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events,
               arg_min(event_type, rn) AS entry,
               arg_max(event_type, rn) AS exit
        FROM pos GROUP BY user_id, session_id)
      SELECT entry, exit, COUNT(*) AS n_sessions,
             CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_bounce,
             CAST(SUM(n_events) AS BIGINT) AS total_events,
             CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_events
      FROM per_session
      GROUP BY entry, exit
      ORDER BY entry, exit
    """))

  val all: Seq[GraftQuery] = Seq(q231)
}
