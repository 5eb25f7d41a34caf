package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X175 — frequent session paths (the "top user journeys" census;
  * the k-prefix form of sequence clustering that ships in every
  * product-analytics suite, and the empirical input to a Markov
  * model one order above X46's single-step transition matrix): each
  * q35 session is rendered as its ordered event-type path, truncated
  * at [[PrefixLen]] steps, and paths are ranked by supporting
  * sessions. X170 asks "does a precede b"; this keeps the WHOLE
  * prefix — "view>search>view>purchase" and "search>view>purchase"
  * are different rows here and indistinguishable to pair support.
  *
  * Determinism: the path string is built from the session's (ts,
  * event_id) total order via sort_array over (rn, type) structs —
  * collection order never matters; truncation at a FIXED prefix
  * bounds the group key (paths over 8 types × ≤6 steps, not
  * unbounded session length); top-k is a total (n_sessions desc,
  * path) order.
  *
  * Scale shape: the q35 session cut (shared exchange), one
  * session-keyed groupBy whose value is the ≤PrefixLen struct array,
  * one map-side path census, TakeOrdered for the top-k. Nothing
  * beyond the session exchange scales with the corpus.
  */
object FrequentPaths {

  /** Path prefix length (steps kept per session). */
  val PrefixLen = 6

  /** Top paths kept. */
  val TopPaths = 50

  /** Path census over an (user_id, ts, event_id, event_type) frame. */
  def paths(events: DataFrame): DataFrame = {
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
    val perSession = sess.filter(col("rn") <= PrefixLen)
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("rn"), col("event_type")))),
          s => s("event_type")),
        ">").as("path"))
    perSession.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))))
      .filter(col("rk") <= TopPaths)
      .select(col("rk"), col("path"), col("n_sessions"), col("n_users"))
      .orderBy(col("rk"))
  }

  /** q213 — the top-50 session paths over the events stream. */
  val q213 = GraftQuery(
    "q213_frequent_paths",
    (s, d) => paths(t(s, d, "events")),
    Some(s"""
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
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM pos WHERE rn <= $PrefixLen
        GROUP BY user_id, session_id),
      census AS (
        SELECT path, COUNT(*) AS n_sessions,
               COUNT(DISTINCT user_id) AS n_users
        FROM per_session GROUP BY path)
      SELECT CAST(rk AS INTEGER) AS rk, path, n_sessions, n_users
      FROM (
        SELECT path, n_sessions, n_users,
               ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rk
        FROM census)
      WHERE rk <= $TopPaths
      ORDER BY rk
    """))

  val all: Seq[GraftQuery] = Seq(q213)
}
