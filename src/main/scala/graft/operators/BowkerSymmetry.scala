package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X242 — Bowker's test of symmetry (Bowker 1948, the k×k
  * generalization of q249's McNemar) on the event-type transition
  * matrix: is user flow between event types REVERSIBLE (n_ij ≈ n_ji),
  * or does traffic circulate (view→purchase ≫ purchase→view)? X39's
  * transition matrix reports the rates; Bowker tests whether the
  * observed asymmetry exceeds chance — χ² = Σ_{i<j} (n_ij−n_ji)² /
  * (n_ij+n_ji), df = #{pairs with n_ij+n_ji > 0}, the standard
  * directionality gate on a flow matrix before anyone narrates
  * "funnels" from it.
  *
  * Determinism: successor pairing is the shared (user, ts, event_id)
  * lag chain (the X39/X194 window); cell counts are exact longs; each
  * pair's χ² term is one double tree and the ≤k(k−1)/2 terms sum on
  * DECIMAL(30,14) lanes; df is data-dependent, so the critical value
  * is the shared [[ChiSqCrit]] CASE evaluated AT df (loud error past
  * the table on both engines). No discordant pairs at all → NULL χ².
  *
  * Scale shape: one user-partitioned lag window over the corpus →
  * map-side-combined cell counts (≤k² rows) → a self-join of that
  * planning frame on the transposed key → one fold row. Corpus
  * touched once.
  */
object BowkerSymmetry {

  /** q280 — symmetry of the event-type transition counts. */
  val q280 = GraftQuery(
    "q280_bowker_symmetry", {
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val cells = t(s, d, "events")
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .filter(col("nxt").isNotNull &&
            col("event_type") =!= col("nxt"))
          .groupBy(col("event_type").as("a"), col("nxt").as("b"))
          .agg(count(lit(1)).as("c"))
        // symmetrize on the unordered pair key so a one-directional
        // cell (n_ij > 0, n_ji = 0) still forms its pair row
        val pairs = cells
          .groupBy(least(col("a"), col("b")).as("lo"),
            greatest(col("a"), col("b")).as("hi"))
          .agg(sum(when(col("a") < col("b"), col("c")).otherwise(0L))
            .as("nab"),
            sum(when(col("a") > col("b"), col("c")).otherwise(0L))
              .as("nba"))
        val critCase = ChiSqCrit.sparkCase("df", "bowker")
        pairs
          .withColumn("term",
            (col("nab") - col("nba")).cast("double") *
              (col("nab") - col("nba")).cast("double") /
              (col("nab") + col("nba")).cast("double"))
          .agg(sum(col("nab") + col("nba")).as("n_discordant"),
            count(lit(1)).as("df"),
            sum(col("term").cast("decimal(30,14)")).cast("double")
              .as("chi2"))
          .withColumn("chi2_r",
            when(col("df") > 0L, round(col("chi2"), 6)))
          .withColumn("crit",
            when(col("df") > 0L, expr(critCase)))
          .select(col("n_discordant"), col("df"), col("chi2_r"),
            round(col("crit"), 6).as("crit_r"),
            (col("chi2") > col("crit")).as("asymmetric"))
      }
    },
    Some(s"""
      WITH chain AS (
        SELECT event_type AS a,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS b
        FROM events),
      cells AS (
        SELECT a, b, COUNT(*) AS c
        FROM chain
        WHERE b IS NOT NULL AND a <> b
        GROUP BY a, b),
      pairs AS (
        SELECT least(a, b) AS lo, greatest(a, b) AS hi,
               SUM(CASE WHEN a < b THEN c ELSE 0 END) AS nab,
               SUM(CASE WHEN a > b THEN c ELSE 0 END) AS nba
        FROM cells
        GROUP BY 1, 2),
      folded AS (
        SELECT CAST(SUM(nab + nba) AS BIGINT) AS n_discordant,
               COUNT(*) AS df,
               CAST(SUM(CAST(
                 CAST(nab - nba AS DOUBLE) * CAST(nab - nba AS DOUBLE)
                   / CAST(nab + nba AS DOUBLE)
                 AS DECIMAL(30,14))) AS DOUBLE) AS chi2
        FROM pairs)
      SELECT n_discordant, df,
             CASE WHEN df > 0 THEN round(chi2, 6) END AS chi2_r,
             CASE WHEN df > 0 THEN
               round(${ChiSqCrit.duckCase("df", "bowker")}, 6)
             END AS crit_r,
             CASE WHEN df > 0 THEN
               chi2 > ${ChiSqCrit.duckCase("df", "bowker")}
             END AS asymmetric
      FROM folded
    """))

  val all: Seq[GraftQuery] = Seq(q280)
}
