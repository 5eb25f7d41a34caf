package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X148 — l-diversity audit (Machanavajjhala, Kifer, Gehrke &
  * Venkitasubramaniam, "l-Diversity: Privacy Beyond k-Anonymity",
  * TKDE 2007): k-anonymity (X117) counts GROUP SIZES over the
  * quasi-identifiers, but a large group whose sensitive attribute is
  * (nearly) constant still leaks — the homogeneity attack. This audit
  * reports, per QI group, the number of DISTINCT sensitive values and
  * whether it meets the l bar, plus the group's dominant-value share
  * in exact micro-units (the skew that drives the probabilistic
  * variant of the attack).
  *
  * QI here = (event_type, hour-of-day) — the published dimensions;
  * sensitive = user_id. All outputs exact integers (the share is an
  * integer micro-unit division, the q111 recipe).
  *
  * Scale shape: one groupBy to the (QI, sensitive) frame (map-side
  * combined), one groupBy from there to the |QI| frame — the exact
  * two-level distinct-count plan, no countDistinct EXPAND anywhere.
  */
object LDiversity {

  /** Minimum distinct sensitive values per released QI group. */
  val L = 5

  /** q189 — per-(type, hour-of-day) l-diversity audit. */
  val q189 = GraftQuery(
    "q189_l_diversity", {
      (s, d) => {
        val cells = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            hour(col("ts")).as("hod"), col("user_id"))
          .agg(count(lit(1)).as("c"))
        cells
          .groupBy(col("g"), col("hod"))
          .agg(sum(col("c")).as("n"),
            count(lit(1)).as("l_distinct"),
            max(col("c")).as("top_cnt"))
          .select(col("g"), col("hod"), col("n"), col("l_distinct"),
            (col("l_distinct") >= L).as("meets_l"),
            // dominant-value share in exact micro-units:
            // (2e6·top + n) div (2n) — the repo's round-half-up form
            expr("(2000000 * top_cnt + n) div (2 * n)")
              .as("top_share_micro"))
          .orderBy(col("g"), col("hod"))
      }
    },
    Some(s"""
      WITH cells AS (
        SELECT event_type AS g, hour(ts) AS hod, user_id, COUNT(*) AS c
        FROM events GROUP BY 1, 2, 3),
      groups AS (
        SELECT g, hod, SUM(c) AS n, COUNT(*) AS l_distinct,
               MAX(c) AS top_cnt
        FROM cells GROUP BY 1, 2)
      SELECT g, CAST(hod AS INTEGER) AS hod, CAST(n AS BIGINT) AS n,
             CAST(l_distinct AS BIGINT) AS l_distinct,
             l_distinct >= $L AS meets_l,
             CAST((2000000 * top_cnt + n) // (2 * n) AS BIGINT)
               AS top_share_micro
      FROM groups ORDER BY g, hod
    """))

  val all: Seq[GraftQuery] = Seq(q189)
}
