package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X223 — month-over-month top-K membership turnover: the top-20
  * customers by exact monthly revenue, and for every consecutive
  * month pair the retained count and Jaccard overlap of the two
  * leaderboards. Heavy-hitter IDENTITY churn is the ops signal the
  * magnitude tiers miss — q91 finds heavy hitters in one window,
  * q152's Gini says concentration is high, but "is it the SAME whales
  * every month" (stable key accounts vs a rotating cast) is a set
  * question across windows, the retention analogue of q98 applied to
  * leaderboards. Low Jaccard on stable revenue = churn masked by
  * aggregates.
  *
  * Determinism: monthly revenue is the exact DECIMAL sum (the q01
  * discipline), so the rank order (revenue DESC, custkey) and hence
  * the top-K SETS are identical across engines; retained/Jaccard are
  * exact integer set arithmetic, one double division at the end.
  * Months are calendar-truncated TIMESTAMPs on both sides (the
  * DATE-vs-TIMESTAMP comparator trap, SURVEY §5.2).
  *
  * Scale shape: one map-side groupBy to the |months × customers|
  * frame, one rank window PARTITIONED by month, then all set algebra
  * on the |months × K| leaderboard frame. Corpus touched once.
  */
object TopkTurnover {

  /** Leaderboard size. */
  val K = 20

  /** The ranked monthly top-K leaderboard (month, o_custkey, rn) —
    * shared by q256 and X225's rank-biased overlap (q257) so the two
    * comparisons run on the identical membership.
    */
  private[operators] def monthlyTop(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val rev = t(s, d, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
        col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.partitionBy(col("month"))
      .orderBy(col("rev").desc, col("o_custkey"))
    rev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("month"), col("o_custkey"), col("rn"))
  }

  /** The DuckDB mirror of [[monthlyTop]] as a CTE block ending in
    * `top(month, o_custkey, rn)`.
    */
  private[operators] def monthlyTopSql: String = s"""rev AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                 AS month,
               o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2),
      top AS (
        SELECT month, o_custkey, rn
        FROM (SELECT month, o_custkey,
                     ROW_NUMBER() OVER (PARTITION BY month
                       ORDER BY rev DESC, o_custkey) AS rn
              FROM rev)
        WHERE rn <= $K)"""

  /** q256 — consecutive-month top-20-customer retention and Jaccard. */
  val q256 = GraftQuery(
    "q256_topk_turnover", {
      (s, d) => {
        val top = monthlyTop(s, d).select(col("month"), col("o_custkey"))
        val sizes = top.groupBy(col("month"))
          .agg(count(lit(1)).as("sz"))
        val retained = top.as("a")
          .join(top.as("b"),
            col("b.month") === add_months(col("a.month"), 1) &&
              col("a.o_custkey") === col("b.o_custkey"))
          .groupBy(col("b.month").as("month"))
          .agg(count(lit(1)).as("retained"))
        sizes.as("p")
          .join(sizes.as("c"),
            col("c.month") === add_months(col("p.month"), 1))
          .join(retained,
            retained("month") === col("c.month"), "left")
          .withColumn("ret", coalesce(col("retained"), lit(0L)))
          .select(col("c.month").as("month"),
            col("p.sz").as("prev_size"), col("c.sz").as("cur_size"),
            col("ret").as("retained"),
            round(col("ret").cast("double") /
              (col("p.sz") + col("c.sz") - col("ret")).cast("double"),
              6).as("jaccard"))
          .orderBy(col("month"))
      }
    },
    Some(s"""
      WITH $monthlyTopSql,
      sizes AS (
        SELECT month, COUNT(*) AS sz FROM top GROUP BY month),
      ret AS (
        SELECT b.month AS month, COUNT(*) AS retained
        FROM top a JOIN top b
          ON b.month = a.month + INTERVAL 1 MONTH
          AND b.o_custkey = a.o_custkey
        GROUP BY 1)
      SELECT c.month AS month,
             p.sz AS prev_size, c.sz AS cur_size,
             CAST(COALESCE(r.retained, 0) AS BIGINT) AS retained,
             round(CAST(COALESCE(r.retained, 0) AS DOUBLE)
               / CAST(p.sz + c.sz - COALESCE(r.retained, 0) AS DOUBLE),
               6) AS jaccard
      FROM sizes p
      JOIN sizes c ON c.month = p.month + INTERVAL 1 MONTH
      LEFT JOIN ret r ON r.month = c.month
      ORDER BY month
    """))

  val all: Seq[GraftQuery] = Seq(q256)
}
