package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X193 — exact Shapley-value attribution over the two-channel
  * coalition game (Shapley 1953; the "data-driven attribution" of ad
  * platforms, exact here because the channel set is small): q35
  * SESSIONS are partitioned by their exposed channel subset
  * S ⊆ {view, click}, the characteristic function v(S) is the exact
  * conversion rate (session contains a purchase) of each exposure
  * class, and each channel's Shapley value — the session is the
  * coalition unit because user-LIFETIME exposure degenerates on this
  * corpus (measured: 100 % of users see both channels, leaving one
  * class and an undefined game), and session granularity is what the
  * ad-platform implementations bucket by anyway —
  *   φ_view = ½[v({v}) − v(∅)] + ½[v({v,c}) − v({c})]
  * is its marginal-contribution average — the credit split that,
  * unlike first/last/U heuristics, is the unique one satisfying
  * efficiency + symmetry + dummy (the spec asserts the efficiency
  * identity φ_v + φ_c = v(full) − v(∅) in exact rational arithmetic).
  *
  * Determinism: the subset census is exact longs; each v(S) and φ is
  * ONE fixed double tree; a missing exposure class makes both φ NULL
  * (v is undefined there — stated, not silently zeroed).
  *
  * Scale shape: the q35 session cut (two user-partitioned windows —
  * the exchange every session query shares), one map-side per-session
  * groupBy (three boolean aggregates — the |sessions| frame), one
  * map-side census to ≤ 4 rows, a 1-row pivot of that census,
  * output = 4 census rows + 2 Shapley rows.
  */
object ShapleyAttribution {

  /** q229 — exposure-class census + the two Shapley values. */
  val q229 = GraftQuery(
    "q229_shapley_attribution", {
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val newSession = when(
          col("ts").cast("double") -
            lag(col("ts"), 1).over(byUser).cast("double") > 1800d ||
            lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0)
        val perUser = t(s, d, "events")
          .withColumn("session_id", sum(newSession).over(byUser
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            max(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("has_v"),
            max(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("has_c"),
            max(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("conv"))
        val census = perUser.groupBy(col("has_v"), col("has_c"))
          .agg(count(lit(1)).as("n_sessions"), sum(col("conv")).as("n_conv"))
        def cls(v: Int, c: Int, col0: String) =
          max(when(col("has_v") === v && col("has_c") === c,
            col(col0))).as(s"${col0}_${v}${c}")
        val wide = census.agg(
          cls(0, 0, "n_sessions"), cls(0, 0, "n_conv"),
          cls(1, 0, "n_sessions"), cls(1, 0, "n_conv"),
          cls(0, 1, "n_sessions"), cls(0, 1, "n_conv"),
          cls(1, 1, "n_sessions"), cls(1, 1, "n_conv"))
        def rate(v: Int, c: Int) =
          col(s"n_conv_${v}${c}").cast("double") /
            col(s"n_sessions_${v}${c}").cast("double")
        val complete = Seq((0, 0), (1, 0), (0, 1), (1, 1))
          .map { case (v, c) => col(s"n_sessions_${v}${c}").isNotNull }
          .reduce(_ && _)
        val shapley = wide.select(
          when(complete,
            (rate(1, 0) - rate(0, 0)) / 2 + (rate(1, 1) - rate(0, 1)) / 2)
            .as("phi_view"),
          when(complete,
            (rate(0, 1) - rate(0, 0)) / 2 + (rate(1, 1) - rate(1, 0)) / 2)
            .as("phi_click"))
        val censusRows = census.select(
          concat(lit("class_v"), col("has_v"), lit("c"), col("has_c"))
            .as("row"),
          col("n_sessions"), col("n_conv"),
          (col("n_conv").cast("double") / col("n_sessions").cast("double"))
            .as("value"))
        val phiRows = shapley.select(lit("shapley_view").as("row"),
            lit(null).cast("long").as("n_sessions"),
            lit(null).cast("long").as("n_conv"),
            col("phi_view").as("value"))
          .unionByName(shapley.select(lit("shapley_click").as("row"),
            lit(null).cast("long").as("n_sessions"),
            lit(null).cast("long").as("n_conv"),
            col("phi_click").as("value")))
        censusRows.unionByName(phiRows).orderBy(col("row"))
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
                 AS BIGINT) AS session_id
        FROM flagged),
      per_user AS (
        SELECT user_id, session_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS has_v,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 AS has_c,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
        FROM sess GROUP BY user_id, session_id),
      census AS (
        SELECT has_v, has_c, COUNT(*) AS n_sessions,
               CAST(SUM(conv) AS BIGINT) AS n_conv
        FROM per_user GROUP BY 1, 2),
      wide AS (
        SELECT
          MAX(CASE WHEN has_v=0 AND has_c=0 THEN n_sessions END) AS nu00,
          MAX(CASE WHEN has_v=0 AND has_c=0 THEN n_conv END) AS nc00,
          MAX(CASE WHEN has_v=1 AND has_c=0 THEN n_sessions END) AS nu10,
          MAX(CASE WHEN has_v=1 AND has_c=0 THEN n_conv END) AS nc10,
          MAX(CASE WHEN has_v=0 AND has_c=1 THEN n_sessions END) AS nu01,
          MAX(CASE WHEN has_v=0 AND has_c=1 THEN n_conv END) AS nc01,
          MAX(CASE WHEN has_v=1 AND has_c=1 THEN n_sessions END) AS nu11,
          MAX(CASE WHEN has_v=1 AND has_c=1 THEN n_conv END) AS nc11
        FROM census),
      phi AS (
        SELECT
          CASE WHEN nu00 IS NOT NULL AND nu10 IS NOT NULL
                AND nu01 IS NOT NULL AND nu11 IS NOT NULL THEN
            (CAST(nc10 AS DOUBLE)/CAST(nu10 AS DOUBLE)
             - CAST(nc00 AS DOUBLE)/CAST(nu00 AS DOUBLE)) / 2
            + (CAST(nc11 AS DOUBLE)/CAST(nu11 AS DOUBLE)
               - CAST(nc01 AS DOUBLE)/CAST(nu01 AS DOUBLE)) / 2
          END AS phi_view,
          CASE WHEN nu00 IS NOT NULL AND nu10 IS NOT NULL
                AND nu01 IS NOT NULL AND nu11 IS NOT NULL THEN
            (CAST(nc01 AS DOUBLE)/CAST(nu01 AS DOUBLE)
             - CAST(nc00 AS DOUBLE)/CAST(nu00 AS DOUBLE)) / 2
            + (CAST(nc11 AS DOUBLE)/CAST(nu11 AS DOUBLE)
               - CAST(nc10 AS DOUBLE)/CAST(nu10 AS DOUBLE)) / 2
          END AS phi_click
        FROM wide)
      SELECT row, n_sessions, n_conv, value FROM (
        SELECT 'class_v' || has_v || 'c' || has_c AS row,
               n_sessions, n_conv,
               CAST(n_conv AS DOUBLE) / CAST(n_sessions AS DOUBLE)
                 AS value
        FROM census
        UNION ALL
        SELECT 'shapley_view', CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT), phi_view FROM phi
        UNION ALL
        SELECT 'shapley_click', CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT), phi_click FROM phi)
      ORDER BY row
    """))

  val all: Seq[GraftQuery] = Seq(q229)
}
