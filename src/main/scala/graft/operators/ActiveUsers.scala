package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X190 — DAU / WAU / MAU + stickiness (the product-analytics
  * vital signs; "stickiness" = DAU/MAU, the engagement ratio every
  * growth dashboard leads with): per day the distinct users active
  * that day, in the trailing 7 days, and in the trailing 30 — three
  * OVERLAPPING distinct counts a naive per-window COUNT DISTINCT
  * recomputes from facts 37× over.
  *
  * The (user, day) contraction makes it exact and cheap: facts
  * collapse once to the distinct user-day frame (the activity
  * ledger), and each trailing-window census is a bounded-fanout join
  * of that frame against the day spine (≤ 7 / ≤ 30 day offsets per
  * user-day row — integer day arithmetic, no timestamp windows).
  * Stickiness is one double division. Days with zero activity simply
  * have no row in the spine (stated — the spine is observed days,
  * X128's gap-fill composes if a dense calendar is wanted).
  *
  * Scale shape: one map-side distinct to |user-days|, one explode by
  * the window offsets (×37 of the CONTRACTED frame, not the facts),
  * two map-side distinct-count aggregations to the |days| frame.
  */
object ActiveUsers {

  /** q227 — the daily DAU/WAU/MAU + stickiness series. */
  val q227 = GraftQuery(
    "q227_active_users", {
      (s, d) => {
        val userDays = t(s, d, "events")
          .select(col("user_id"),
            (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
              .cast("long").as("day"))
          .distinct()
        val dau = userDays.groupBy(col("day"))
          .agg(count(lit(1)).as("dau"))
        // a user-day contributes to the W/M census of every day in
        // the 7/30 days AFTER it — explode the contracted frame
        val wau = userDays
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6)).as("day"))
          .distinct()
          .groupBy(col("day")).agg(count(lit(1)).as("wau"))
        val mau = userDays
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + 29)).as("day"))
          .distinct()
          .groupBy(col("day")).agg(count(lit(1)).as("mau"))
        dau.join(wau, Seq("day")).join(mau, Seq("day"))
          .withColumn("stickiness",
            col("dau").cast("double") / col("mau").cast("double"))
          .withColumn("date", timestamp_seconds(col("day") * 86400L))
          // only days that themselves saw activity (the dau spine)
          .select(col("date"), col("dau"), col("wau"), col("mau"),
            col("stickiness"))
          .orderBy(col("date"))
      }
    },
    Some("""
      WITH user_days AS (
        SELECT DISTINCT user_id,
               epoch(date_trunc('day', ts)) // 86400 AS day
        FROM events),
      dau AS (
        SELECT day, COUNT(*) AS dau FROM user_days GROUP BY day),
      wau AS (
        SELECT day, COUNT(*) AS wau FROM (
          SELECT DISTINCT user_id, day + o AS day
          FROM user_days,
               (SELECT unnest(range(0, 7)) AS o))
        GROUP BY day),
      mau AS (
        SELECT day, COUNT(*) AS mau FROM (
          SELECT DISTINCT user_id, day + o AS day
          FROM user_days,
               (SELECT unnest(range(0, 30)) AS o))
        GROUP BY day)
      SELECT make_timestamp(CAST(d.day * 86400 * 1000000 AS BIGINT))
               AS date,
             d.dau, w.wau, m.mau,
             CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE)
               AS stickiness
      FROM dau d JOIN wau w ON w.day = d.day
      JOIN mau m ON m.day = d.day
      ORDER BY date
    """))

  val all: Seq[GraftQuery] = Seq(q227)
}
