package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X185 — position-based (U-shaped) multi-touch attribution: each
  * purchase's credit is split 40 % to the FIRST touch, 40 % to the
  * LAST, 20 % across the middles — the standard multi-touch model
  * next to X121's last-touch (last-touch answers "what closed",
  * U-shaped answers "what opened AND what closed", the difference
  * that decides top-of-funnel budgets). Touch set = the same X121
  * contract: view/click events of the same user within the 7-day
  * lookback before the purchase; no touches → the purchase is
  * `organic` with full credit.
  *
  * Exact-credit discipline: each purchase distributes EXACTLY
  * 1,000,000 micro-units (spec-asserted invariant). One touch takes
  * all of it; two take 500,000 each (the no-middles convention,
  * stated); otherwise 400,000 / 400,000 and the middles get
  * 200,000 div (m−2) each with the remainder handed one unit apiece
  * to the EARLIEST middles — integer arithmetic end to end, so the
  * channel census hashes bit-for-bit. Shares are one double
  * division at render.
  *
  * Scale shape: purchases ⋈ touches is a user-keyed interval join
  * (the X13/X21 machinery — shuffles once on user_id; the face is
  * lookback-bounded per purchase, the model's own definition), then
  * per-purchase rank/count windows on the joined frame and one
  * map-side channel census.
  */
object PositionAttribution {

  val LookbackDays = 7
  val Micro = 1000000L

  /** Channel census over (event_id, user_id, event_type, us) rows. */
  def uShaped(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("us").as("pus"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("event_id").as("tid"), col("us").as("tus"))
    // the window condition rides IN the left join: a purchase whose
    // touches are all out-of-window must still surface (as organic),
    // which a post-join filter would silently drop
    val joined = purchases.join(touches,
      purchases("user_id") === touches("user_id") &&
        touches("tus") < purchases("pus") &&
        purchases("pus") - touches("tus") <=
          lit(LookbackDays * 86400000000L),
      "left")
      .select(col("pid"), col("pus"), col("channel"), col("tid"),
        col("tus"))
    val wP = Window.partitionBy(col("pid"))
    val ranked = joined
      .withColumn("m", count(col("tid")).over(wP))
      .withColumn("rk", row_number().over(
        wP.orderBy(col("tus").asc_nulls_first, col("tid"))))
    val credited = ranked.withColumn("credit",
      when(col("m") === 0, lit(Micro)) // organic carrier row
        .otherwise(when(col("m") === 1, lit(Micro))
          .otherwise(when(col("m") === 2, lit(Micro / 2))
            .otherwise(when(col("rk") === 1 || col("rk") === col("m"),
              lit(Micro * 2 / 5))
              .otherwise(
                expr(s"(${Micro / 5}) div (m - 2)") +
                  when(col("rk") - 1 <= expr(s"(${Micro / 5}) % (m - 2)"),
                    1L).otherwise(0L))))))
      .withColumn("channel",
        coalesce(col("channel"), lit("organic")))
    val total = purchases.agg(
      (count(lit(1)) * Micro).as("total_micro"))
    credited.groupBy(col("channel"))
      .agg(countDistinct(col("pid")).as("n_purchases"),
        sum(col("credit")).as("credit_micro"))
      .crossJoin(broadcast(total))
      .withColumn("credit_share",
        col("credit_micro").cast("double") /
          col("total_micro").cast("double"))
      .drop("total_micro")
      .orderBy(col("channel"))
  }

  /** q222 — the U-shaped channel census over events. */
  val q222 = GraftQuery(
    "q222_position_attribution", {
      (s, d) =>
        uShaped(t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us")))
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        FROM events),
      purchases AS (
        SELECT event_id AS pid, user_id, us AS pus
        FROM ev WHERE event_type = 'purchase'),
      touches AS (
        SELECT user_id, event_type AS channel, event_id AS tid,
               us AS tus
        FROM ev WHERE event_type IN ('view', 'click')),
      joined AS (
        SELECT p.pid, p.user_id, t.channel, t.tid, t.tus
        FROM purchases p LEFT JOIN touches t
          ON t.user_id = p.user_id AND t.tus < p.pus
         AND p.pus - t.tus <= ${LookbackDays}::BIGINT * 86400000000),
      ranked AS (
        SELECT pid, channel, tid,
               COUNT(tid) OVER (PARTITION BY pid) AS m,
               ROW_NUMBER() OVER (PARTITION BY pid
                 ORDER BY tus ASC NULLS FIRST, tid) AS rk
        FROM joined),
      credited AS (
        SELECT pid, COALESCE(channel, 'organic') AS channel,
               CASE WHEN m = 0 THEN $Micro
                    WHEN m = 1 THEN $Micro
                    WHEN m = 2 THEN ${Micro / 2}
                    WHEN rk = 1 OR rk = m THEN ${Micro * 2 / 5}
                    ELSE (${Micro / 5}) // (m - 2) +
                      CASE WHEN rk - 1 <= (${Micro / 5}) % (m - 2)
                           THEN 1 ELSE 0 END
               END AS credit
        FROM ranked)
      SELECT channel, COUNT(DISTINCT pid) AS n_purchases,
             CAST(SUM(credit) AS BIGINT) AS credit_micro,
             CAST(SUM(credit) AS DOUBLE) /
               CAST((SELECT COUNT(*) FROM purchases) * $Micro AS DOUBLE)
               AS credit_share
      FROM credited
      GROUP BY channel
      ORDER BY channel
    """))

  val all: Seq[GraftQuery] = Seq(q222)
}
