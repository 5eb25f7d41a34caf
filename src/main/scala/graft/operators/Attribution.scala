package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X121/X122 — conversion attribution + conversion-lag statistics:
  * the event-warehouse pair every growth/analytics stack runs next to
  * the X52 funnel and X86 transition matrix.
  *
  * X121 (q165) LAST-TOUCH ATTRIBUTION: each purchase is credited to
  * the same user's most recent PRECEDING marketing touch (view/click)
  * within a 7-day lookback — the default attribution model of every
  * marketing warehouse; purchases with no in-window touch are
  * `organic`. One carry-forward window per user (last(touch) over
  * rows preceding, ignoreNulls) — the X13/X14 machinery, no join at
  * all, so the corpus shuffles ONCE on user_id.
  *
  * X122 (q166) CONVERSION-LAG PERCENTILES: signup → first purchase
  * delay distribution (count, conversion share, p25/p50/p75/p90) —
  * the activation metric. Per-user min timestamps from one
  * map-side-combined agg; percentiles on the |users| frame via the
  * exact interpolated percentile (quantile_cont parity, q139/q145
  * recipe; GK swap at 100 TB, same plan).
  *
  * Determinism: event time compared as exact integer MICROSECONDS
  * (unix_micros ≡ DuckDB epoch_us — both engines store micros), ties
  * broken by event_id in the window order, lags are integer µs
  * rendered as exact-seconds doubles (µs/1e6 — one division), share
  * in q111 micro-units.
  */
object Attribution {

  /** Lookback window. */
  val LookbackDays = 7

  /** The attribution core over (event_id, user_id, event_type, us)
    * rows — us in exact integer microseconds.
    */
  def lastTouch(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val touched = ev
          .withColumn("touch", last(
            when(col("event_type").isin("view", "click"),
              struct(col("us"), col("event_id"), col("event_type"))),
            ignoreNulls = true).over(w))
        touched.filter(col("event_type") === "purchase")
          .withColumn("lag_us", col("us") - col("touch.us"))
          .withColumn("in_window",
            col("touch").isNotNull &&
              col("lag_us") <= lit(LookbackDays * 86400000000L))
          .select(col("event_id").as("purchase_id"), col("user_id"),
            when(col("in_window"), col("touch.event_id"))
              .as("attrib_event_id"),
            coalesce(when(col("in_window"), col("touch.event_type")),
              lit("organic")).as("attrib_channel"),
            (when(col("in_window"), col("lag_us"))
              .cast("double") / 1000000.0d).as("lag_seconds"))
          .orderBy(col("purchase_id"))
  }

  /** q165 — last-touch attribution of every purchase. */
  val q165 = GraftQuery(
    "q165_last_touch_attribution", {
      (s, d) =>
        lastTouch(t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us")))
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        FROM events),
      touched AS (
        SELECT event_id, user_id, event_type, us,
               last_value(CASE WHEN event_type IN ('view', 'click')
                 THEN struct_pack(us := us, event_id := event_id,
                                  event_type := event_type)
                 END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS touch
        FROM ev)
      SELECT event_id AS purchase_id, user_id,
             CASE WHEN touch IS NOT NULL AND us - touch.us
                    <= ${LookbackDays * 86400000000L}
                  THEN touch.event_id END AS attrib_event_id,
             COALESCE(CASE WHEN touch IS NOT NULL AND us - touch.us
                    <= ${LookbackDays * 86400000000L}
                  THEN touch.event_type END, 'organic') AS attrib_channel,
             CAST(CASE WHEN touch IS NOT NULL AND us - touch.us
                    <= ${LookbackDays * 86400000000L}
                  THEN us - touch.us END AS DOUBLE) / 1000000.0
               AS lag_seconds
      FROM touched
      WHERE event_type = 'purchase'
      ORDER BY purchase_id
    """))

  /** q166 — signup → first-purchase conversion-lag distribution. */
  val q166 = GraftQuery(
    "q166_conversion_lag", {
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val users = ev.groupBy(col("user_id")).agg(
          min(when(col("event_type") === "signup", col("us")))
            .as("signup_us"),
          min(when(col("event_type") === "purchase", col("us")))
            .as("first_purchase_us"))
          .filter(col("signup_us").isNotNull)
          .withColumn("lag_s",
            when(col("first_purchase_us") >= col("signup_us"),
              (col("first_purchase_us") - col("signup_us"))
                .cast("double") / 1000000.0d))
        users.agg(
          count(lit(1)).as("n_signups"),
          count(col("lag_s")).as("n_converted"),
          expr("percentile(lag_s, array(0.25, 0.5, 0.75, 0.9))")
            .as("ps"))
          .select(col("n_signups"), col("n_converted"),
            (expr("(2000000 * n_converted + n_signups) " +
              "div (2 * n_signups)").cast("double") / 1000000.0d)
              .as("converted_share_r"),
            round(element_at(col("ps"), 1), 3).as("p25_s"),
            round(element_at(col("ps"), 2), 3).as("p50_s"),
            round(element_at(col("ps"), 3), 3).as("p75_s"),
            round(element_at(col("ps"), 4), 3).as("p90_s"))
      }
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      users AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN us END)
                 AS signup_us,
               MIN(CASE WHEN event_type = 'purchase' THEN us END)
                 AS first_purchase_us
        FROM ev GROUP BY user_id),
      lagged AS (
        SELECT user_id, signup_us, first_purchase_us,
               CASE WHEN first_purchase_us >= signup_us
                 THEN CAST(first_purchase_us - signup_us AS DOUBLE)
                      / 1000000.0 END AS lag_s
        FROM users WHERE signup_us IS NOT NULL)
      SELECT COUNT(*) AS n_signups,
             COUNT(lag_s) AS n_converted,
             CAST((2000000 * COUNT(lag_s) + COUNT(*)) // (2 * COUNT(*))
               AS DOUBLE) / 1000000.0 AS converted_share_r,
             round(quantile_cont(lag_s, 0.25), 3) AS p25_s,
             round(quantile_cont(lag_s, 0.5), 3) AS p50_s,
             round(quantile_cont(lag_s, 0.75), 3) AS p75_s,
             round(quantile_cont(lag_s, 0.9), 3) AS p90_s
      FROM lagged
    """))

  val all: Seq[GraftQuery] = Seq(q165, q166)
}
