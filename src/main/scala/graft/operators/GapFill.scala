package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X128 — time-series gap-fill and alignment: sparse per-entity event
  * aggregates regularized onto a dense daily grid with the two
  * standard fills — last-observation-carried-forward (the metric
  * dashboard contract) and linear interpolation between the bracketing
  * observations (the feature-engineering contract for models that
  * can't see missingness). Every downstream window/lag/seasonal
  * operator assumes an aligned series; this is the operator that
  * makes the X131 trend / X88 drift inputs honest when the raw feed
  * has silent days.
  *
  * Shape: the grid is generated PER SERIES over [min active day, max
  * active day] (`sequence` + explode — no cross join against a global
  * calendar, so total grid rows = Σ span_u, not |users|·|days|), the
  * observed frame joins back on (user, day) — one shuffle each — and
  * all four bracketing columns (prev/next day and value) come from
  * TWO frame specs over the same user-partitioned sort, which Spark
  * evaluates in a single Window exec pass.
  *
  * Determinism: days are exact integers (µs div 86400e6), per-day
  * values exact decimal sums cast to double once, and each fill is one
  * shared double tree — interpolation is pv + (nv−pv)·((day−pd)/
  * (nd−pd)) with integer day deltas, so both engines round identically.
  */
object GapFill {

  /** The fill kernel over an ALREADY-GRIDDED frame: rows of (user_id,
    * day_no, obs) where gap days carry obs = null. Split out from q170
    * so planted grids — leading/trailing gaps an external calendar
    * would produce, single-observation series — exercise the
    * `coalesce(…, pv, nv)` fallbacks that q170's per-series
    * [min, max] grid can never reach (its boundary days are observed
    * by construction).
    */
  def fill(joined: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("day_no"))
    val back = ord.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = ord.rowsBetween(0, Window.unboundedFollowing)
    val obsd = when(col("obs").isNotNull, col("obs"))
    joined
      .withColumn("pd", last(when(col("obs").isNotNull,
        col("day_no")), ignoreNulls = true).over(back))
      .withColumn("pv", last(obsd, ignoreNulls = true).over(back))
      .withColumn("nd", first(when(col("obs").isNotNull,
        col("day_no")), ignoreNulls = true).over(fwd))
      .withColumn("nv", first(obsd, ignoreNulls = true).over(fwd))
      .select(col("user_id"), col("day_no"), col("obs"),
        col("obs").isNull.as("is_gap"),
        coalesce(col("obs"), col("pv"), col("nv")).as("fill_locf"),
        coalesce(col("obs"),
          col("pv") + (col("nv") - col("pv")) *
            ((col("day_no") - col("pd")).cast("double") /
              (col("nd") - col("pd")).cast("double")),
          col("pv"), col("nv")).as("fill_interp"))
  }

  /** q170 — per-user daily purchase revenue, gap-filled. */
  val q170 = GraftQuery(
    "q170_timeseries_gapfill", {
      (s, d) => {
        val obs = t(s, d, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day_no"))
          .agg(dsum(col("value")).as("obs"))
        val grid = obs.groupBy(col("user_id"))
          .agg(min(col("day_no")).as("d0"), max(col("day_no")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("day_no"))
        fill(grid.join(obs, Seq("user_id", "day_no"), "left"))
          .orderBy(col("user_id"), col("day_no"))
      }
    },
    Some("""
      WITH obs AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day_no,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS obs
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2),
      grid AS (
        SELECT user_id,
               unnest(generate_series(min(day_no), max(day_no)))
                 AS day_no
        FROM obs GROUP BY user_id),
      j AS (
        SELECT g.user_id, g.day_no, o.obs
        FROM grid g LEFT JOIN obs o
          ON o.user_id = g.user_id AND o.day_no = g.day_no),
      w AS (
        SELECT user_id, day_no, obs,
          last_value(CASE WHEN obs IS NOT NULL THEN day_no END
              IGNORE NULLS) OVER
            (PARTITION BY user_id ORDER BY day_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
          last_value(obs IGNORE NULLS) OVER
            (PARTITION BY user_id ORDER BY day_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          first_value(CASE WHEN obs IS NOT NULL THEN day_no END
              IGNORE NULLS) OVER
            (PARTITION BY user_id ORDER BY day_no
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
          first_value(obs IGNORE NULLS) OVER
            (PARTITION BY user_id ORDER BY day_no
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        FROM j)
      SELECT user_id, day_no, obs, obs IS NULL AS is_gap,
             COALESCE(obs, pv, nv) AS fill_locf,
             COALESCE(obs,
               pv + (nv - pv) * (CAST(day_no - pd AS DOUBLE)
                                 / CAST(nd - pd AS DOUBLE)),
               pv, nv) AS fill_interp
      FROM w
      ORDER BY user_id, day_no
    """))

  val all: Seq[GraftQuery] = Seq(q170)
}
