package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X234 — Page's L trend test (Page, JASA 1963): Friedman's blocked
  * ranks pointed at an ORDERED alternative — not "do the k treatments
  * differ" (q265) but "do they rise MONOTONICALLY with the treatment
  * order"? L = Σ_j j·R_j loads each treatment's rank sum with its
  * position, so a consistent ordering across blocks accumulates
  * linearly where Friedman's sum of squares is direction-blind — the
  * standard "does the severity gradient actually grade" test.
  *
  * Blocks = order months, ordered treatments = the five order
  * priorities (score j = the leading digit, exact), metric = the
  * month's order count per priority. Complete blocks only (the q265
  * convention).
  *
  * Determinism: the q265 doubled midranks (r2 = 2·rank + t − 1, exact
  * longs); L2 = Σ_j j·R2_j exact; z = 3·(2·L2 − n·k(k+1)²) /
  * (k·(k+1)·√(n·(k−1))) is ONE double tree over exact longs (the
  * doubled-L algebra folds the usual μ_L/σ_L into integer terms).
  * Ties enter through the midranks; the normal approximation itself
  * is the textbook no-tie form (stated — Page's tie-exact variance is
  * not tabulated). Two-sided at 1.959964 with the direction reported.
  *
  * Scale shape: one scan → the |months × k| census → k-row-partition
  * windows → a 1-row fold.
  */
object PageTrend {

  private val Crit = 1.959964d

  /** q266 — Page trend of order volume across priority levels. */
  val q266 = GraftQuery(
    "q266_page_trend", {
      (s, d) => {
        val monthly = t(s, d, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("mth"),
            substring(col("o_orderpriority"), 1, 1).cast("long").as("j"))
          .agg(count(lit(1)).as("x"))
        val kAll = monthly.agg(countDistinct(col("j")).as("k"))
        val complete = monthly.join(broadcast(kAll))
          .withColumn("blk_n",
            count(lit(1)).over(Window.partitionBy(col("mth"))))
          .filter(col("blk_n") === col("k"))
        val wOrd = Window.partitionBy(col("mth")).orderBy(col("x"))
        val ranked = complete
          .withColumn("rnk", rank().over(wOrd).cast("long"))
          .withColumn("t", count(lit(1)).over(
            Window.partitionBy(col("mth"), col("x"))))
          .withColumn("r2", lit(2L) * col("rnk") + col("t") - 1L)
        ranked.agg(
            countDistinct(col("mth")).as("n"), max(col("k")).as("k"),
            sum(col("j") * col("r2")).as("l2"))
          // k = 1 has no order to trend over — NULL, not a 0 divisor
          .withColumn("z",
            when(col("k") > 1L,
            lit(3.0d) * (lit(2L) * col("l2") -
              col("n") * col("k") * (col("k") + 1L) * (col("k") + 1L))
              .cast("double") /
              (col("k").cast("double") * (col("k") + 1L).cast("double") *
                sqrt(col("n").cast("double") *
                  (col("k") - 1L).cast("double")))))
          .select(col("n"), col("k"), col("l2"),
            round(col("z"), 6).as("z_r"),
            (abs(round(col("z"), 6)) > Crit).as("monotone"),
            when(round(col("z"), 6) > Crit, "increasing")
              .when(round(col("z"), 6) < -Crit, "decreasing")
              .otherwise("none").as("direction"))
      }
    },
    Some(s"""
      WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS j,
               COUNT(*) AS x
        FROM orders GROUP BY 1, 2),
      kall AS (SELECT COUNT(DISTINCT j) AS k FROM monthly),
      complete AS (
        SELECT mth, j, x, k
        FROM (SELECT mth, j, x, k,
                     COUNT(*) OVER (PARTITION BY mth) AS blk_n
              FROM monthly CROSS JOIN kall)
        WHERE blk_n = k),
      ranked AS (
        SELECT mth, j, k,
               2 * RANK() OVER (PARTITION BY mth ORDER BY x)
                 + COUNT(*) OVER (PARTITION BY mth, x) - 1 AS r2
        FROM complete),
      folded AS (
        SELECT COUNT(DISTINCT mth) AS n, MAX(k) AS k,
               CAST(SUM(j * r2) AS BIGINT) AS l2
        FROM ranked),
      stats AS (
        SELECT n, k, l2,
               CASE WHEN k > 1 THEN
                 3.0 * CAST(2 * l2 - n * k * (k + 1) * (k + 1) AS DOUBLE)
                   / (CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE)
                      * sqrt(CAST(n AS DOUBLE) * CAST(k - 1 AS DOUBLE)))
                 END AS z
        FROM folded)
      SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k, l2,
             round(z, 6) AS z_r,
             abs(round(z, 6)) > $Crit AS monotone,
             CASE WHEN round(z, 6) > $Crit THEN 'increasing'
                  WHEN round(z, 6) < -$Crit THEN 'decreasing'
                  ELSE 'none' END AS direction
      FROM stats
    """))

  val all: Seq[GraftQuery] = Seq(q266)
}
