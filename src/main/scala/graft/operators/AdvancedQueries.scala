package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{vehicleType, vehicleTypeSql}
import graft.functions.ModeAggregator

/** Remaining declared surface: typed UDAF (X3), as-of join (X11), cube
  * (X5), approximate distinct (D5 scale path).
  */
object AdvancedQueries {

  /** Custom typed UDAF: most common vehicle type per camera, deterministic
    * tiebreak. Oracle mirrors the mode with a window over counts.
    */
  val q31 = GraftQuery(
    "q31_mode_udaf",
    (s, d) =>
      t(s, d, "events")
        .select(concat(lit("CAM_"), pmod(col("user_id"), lit(3)))
          .as("camera_id"),
          vehicleType(col("event_id")).as("vehicle_type"))
        .groupBy(col("camera_id"))
        .agg(ModeAggregator.modeOf(col("vehicle_type")).as("top_type"),
          count(lit(1)).as("n_frames"))
        .orderBy(col("camera_id")),
    Some(s"""
      WITH frames AS (
        SELECT 'CAM_' || CAST(user_id % 3 AS VARCHAR) AS camera_id,
               ${vehicleTypeSql("event_id")} AS vehicle_type
        FROM events),
      counts AS (
        SELECT camera_id, vehicle_type, COUNT(*) AS n
        FROM frames GROUP BY 1, 2),
      ranked AS (
        SELECT camera_id, vehicle_type,
               ROW_NUMBER() OVER (PARTITION BY camera_id
                                  ORDER BY n DESC, vehicle_type) AS rn
        FROM counts)
      SELECT r.camera_id, r.vehicle_type AS top_type, f.n_frames
      FROM ranked r
      JOIN (SELECT camera_id, COUNT(*) AS n_frames FROM frames GROUP BY 1) f
        ON f.camera_id = r.camera_id
      WHERE rn = 1
      ORDER BY r.camera_id
    """))

  /** As-of join (X11): for every error event, the most recent signup by
    * the same user at-or-before it — via the reusable [[AsOfJoin]]
    * operator (tag + union + one window pass: a single shuffle on
    * user_id, no row explosion, no range join — the merge-join shape an
    * as-of join compiles to on any scale).
    */
  val q32 = GraftQuery(
    "q32_asof_join",
    (s, d) => {
      val e = t(s, d, "events")
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"),
          col("event_id").as("signup_id"))
      AsOfJoin.backward(errors, signups, "user_id", "ts", "ts",
          rightVals = Seq("signup_id"), rightTieBreak = Seq("signup_id"))
        .select(col("event_id").as("error_id"), col("user_id"),
          col("asof_signup_id"))
        .orderBy(col("error_id"))
    },
    Some("""
      WITH tagged AS (
        -- null-key signups excluded to mirror AsOfJoin's equi-join
        -- null semantics (a null-user error gets NULL, never a
        -- null-user signup)
        SELECT user_id, ts, event_id, 0 AS tag, event_id AS signup_id
        FROM events WHERE event_type = 'signup' AND user_id IS NOT NULL
        UNION ALL
        SELECT user_id, ts, event_id, 1 AS tag, NULL AS signup_id
        FROM events WHERE event_type = 'error')
      SELECT event_id AS error_id, user_id, asof_signup_id
      FROM (
        SELECT user_id, event_id, tag,
               LAST_VALUE(signup_id IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, tag, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS asof_signup_id
        FROM tagged)
      WHERE tag = 1
      ORDER BY error_id
    """))

  /** Cube (X5): all grouping-set combinations of type × hour-of-day. */
  val q33 = GraftQuery(
    "q33_cube",
    (s, d) =>
      t(s, d, "events")
        .cube(col("event_type"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("hod")),
    Some("""
      SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events
      GROUP BY CUBE (event_type, hour(ts))
      ORDER BY event_type ASC NULLS FIRST, hod ASC NULLS FIRST
    """))

  /** HLL approximate distinct (D5 scale path), TOLERANCE-BANDED
    * oracle (r16, VERDICT r15 stretch 9): the sketch estimates are
    * engine-specific, so the hashed output carries the EXACT distinct
    * counts (DuckDB reproduces those) plus booleans asserting the
    * estimates land within ±5 % of exact — the oracle pins them TRUE,
    * so a broken HLL path now fails the DRIVER gate, not just
    * AdvancedSpec. The two exact counts are separate single-distinct
    * aggregates (two countDistinct in ONE agg is the EXPAND blowup);
    * at 100 TB the exact arms drop and the estimate IS the product —
    * this query's banded form is the accuracy certificate.
    */
  val q34 = GraftQuery(
    "q34_approx_distinct",
    (s, d) => {
      val li = t(s, d, "lineitem")
      val approx = li.agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      val exactO = li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      val exactP = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
      // no broadcast hint: grouping-key-free aggregates are maxRows=1
      // frames and broadcast unhinted (the q101 precedent — an explicit
      // hint over the lineitem subtree trips PlanSpec's scaling-table
      // broadcast gate)
      approx.join(exactO).join(exactP)
        .select(col("exact_orders"), col("exact_parts"),
          // integer band: |approx − exact|·20 ≤ exact  ⇔  within 5 %
          (abs(col("approx_orders") - col("exact_orders")) * 20
            <= col("exact_orders")).as("orders_within_5pct"),
          (abs(col("approx_parts") - col("exact_parts")) * 20
            <= col("exact_parts")).as("parts_within_5pct"))
    },
    Some("""
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             TRUE AS orders_within_5pct,
             TRUE AS parts_within_5pct
      FROM lineitem
    """))

  /** Top-3 orders per customer through the custom TopKPerGroup physical
    * operator (partial heaps → shuffle ≤ k·groups rows → final heaps) —
    * same semantics as the window formulation q08, same oracle shape.
    */
  val q56 = GraftQuery(
    "q56_topk_native",
    (s, d) =>
      graft.plans.TopK.perGroup(
          t(s, d, "orders"),
          groupCols = Seq(col("o_custkey")),
          orderCols = Seq(col("o_totalprice").desc, col("o_orderkey")),
          k = 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc,
          col("o_orderkey")),
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """))

  /** Salted two-phase aggregation (skew path): same result as a plain
    * GROUP BY — which is exactly what the oracle runs.
    */
  val q57 = GraftQuery(
    "q57_salted_agg",
    (s, d) =>
      SaltedAgg.sumByKey(
          // explicit round: Spark's double→long cast truncates while
          // DuckDB's rounds — round() first in both engines
          t(s, d, "events").select(col("user_id"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents")),
          col("user_id"), col("cents"), salts = 8,
          // event_id as salt entropy: fan-out survives low-cardinality
          // values under a hot key
          saltCols = Seq(col("event_id")))
        .select(col("k").as("user_id"), col("total").as("total_cents"),
          col("n"))
        .orderBy(col("user_id")),
    Some("""
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             COUNT(*) AS n
      FROM events
      GROUP BY 1
      ORDER BY user_id
    """))

  val all: Seq[GraftQuery] = Seq(q31, q32, q33, q34, q56, q57)
}
