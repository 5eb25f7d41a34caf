package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X225 — rank-biased overlap of consecutive monthly leaderboards
  * (Webber, Moffat & Zobel 2010, TOIS): the truncated
  *   RBO@K = (1−p)·Σ_{d=1..K} p^{d−1}·X_d/d,
  * X_d = |A₁..d ∩ B₁..d| at persistence p = 0.9 — the top-WEIGHTED
  * leaderboard similarity X223's Jaccard flattens (Jaccard treats
  * rank 1 and rank 20 alike; RBO discounts geometrically, so whale
  * churn at the TOP moves the score far more than churn at the tail —
  * the IR-standard list comparison, here applied month-over-month).
  * Rides the SAME [[TopkTurnover.monthlyTop]] frame as q256 so the
  * two views can never disagree about membership.
  *
  * Determinism: the depth sum is rewritten PER MEMBER — a customer on
  * both lists at ranks (ra, rb) contributes exactly
  * Σ_{d=max(ra,rb)}^{K} p^{d−1}/d, a tail constant indexed by an
  * integer — so the engine-side work is one literal-array lookup per
  * member (the tail table is computed once, in one fixed driver fold,
  * and spliced into BOTH engines as the same double literals); the
  * cross-member sum travels as DECIMAL(30,14) (the q162 recipe).
  * Months with no shared members emit RBO 0 (the left join).
  *
  * Scale shape: everything past q256's rank window runs on the
  * |months × K| leaderboard frame. Corpus touched once.
  */
object RankBiasedOverlap {

  /** Persistence: weight of depth d is p^{d−1}. */
  val P = 0.9

  /** tail(m) = Σ_{d=m}^{K} p^{d−1}/d, m = 1..K — one driver fold,
    * high-to-low so each tail is the previous plus one term (a fixed
    * double tree, identical to the SQL literal by round-trip).
    */
  val Tails: Seq[Double] = {
    val k = TopkTurnover.K
    (k to 1 by -1).scanLeft(0.0d) { (acc, d) =>
      acc + math.pow(P, d - 1) / d
    }.drop(1).reverse
  }

  /** q257 — month-over-month RBO@20 of the revenue leaderboard. */
  val q257 = GraftQuery(
    "q257_rank_biased_overlap", {
      (s, d) => {
        val top = TopkTurnover.monthlyTop(s, d)
        val tails = typedLit(Tails)
        val contrib = top.as("a")
          .join(top.as("b"),
            col("b.month") === add_months(col("a.month"), 1) &&
              col("a.o_custkey") === col("b.o_custkey"))
          .select(col("b.month").as("month"),
            greatest(col("a.rn"), col("b.rn")).as("m"))
          .groupBy(col("month"))
          .agg(count(lit(1)).as("shared"),
            sum(element_at(tails, col("m").cast("int"))
              .cast("decimal(30,14)")).cast("double").as("wsum"))
        val months = top.select(col("month")).distinct()
        months.as("p")
          .join(months.as("c"),
            col("c.month") === add_months(col("p.month"), 1))
          .join(contrib, contrib("month") === col("c.month"), "left")
          .select(col("c.month").as("month"),
            coalesce(col("shared"), lit(0L)).as("shared"),
            round(lit(1.0d - P) * coalesce(col("wsum"), lit(0.0d)), 6)
              .as("rbo"))
          .orderBy(col("month"))
      }
    },
    Some {
      val tailList = Tails.map(_.toString).mkString("[", ", ", "]")
      s"""
      WITH ${TopkTurnover.monthlyTopSql},
      contrib AS (
        SELECT b.month AS month, COUNT(*) AS shared,
               CAST(SUM(CAST(CAST(($tailList)[GREATEST(a.rn, b.rn)]
                 AS DOUBLE) AS DECIMAL(30,14))) AS DOUBLE) AS wsum
        FROM top a JOIN top b
          ON b.month = a.month + INTERVAL 1 MONTH
          AND b.o_custkey = a.o_custkey
        GROUP BY 1),
      months AS (SELECT DISTINCT month FROM top)
      SELECT c.month AS month,
             CAST(COALESCE(x.shared, 0) AS BIGINT) AS shared,
             round(CAST(${1.0d - P} AS DOUBLE)
               * COALESCE(x.wsum, 0.0), 6) AS rbo
      FROM months p
      JOIN months c ON c.month = p.month + INTERVAL 1 MONTH
      LEFT JOIN contrib x ON x.month = c.month
      ORDER BY month
    """
    })

  val all: Seq[GraftQuery] = Seq(q257)
}
