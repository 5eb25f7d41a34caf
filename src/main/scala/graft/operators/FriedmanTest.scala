package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X233 — Friedman's blocked rank ANOVA (Friedman, JASA 1937): k
  * treatments ranked WITHIN each of n blocks — do event types differ
  * in weekly volume once every week's common level is blocked out?
  * The missing cell of the nonparametric grid: q149 compares 2
  * independent arms, q247 (Kruskal–Wallis) k independent groups; this
  * is k MATCHED groups, where between-block variation (seasonality,
  * fleet growth) would drown an unblocked test — each week ranks its
  * own k types, so only the within-week ORDER ever reaches the
  * statistic.
  *
  * Blocks = epoch weeks (day div 7), treatments = event types, metric
  * = the week's event count (exact long — no double sums anywhere).
  * Only COMPLETE blocks (all k types present) enter, the textbook
  * design; the completeness census is part of the output contract.
  *
  * Determinism: within-block midranks ride the q149 doubled-rank
  * discipline — r2 = 2·rank + t − 1 is an exact long (rank = SQL min
  * rank, t = tie count), so treatment rank sums R2_j, their squares,
  * and the tie-adjusted statistic χ² = (k−1)[ΣR2_j² − n²k(k+1)²] /
  * [Σr2² − nk(k+1)²] (the general tie form, doubled through by 4)
  * stay integer until ONE double division. All-tied blocks everywhere
  * (denominator 0) → NULL. Significance against the shared
  * [[ChiSqCrit]] table at df = k−1, loud past df 12.
  *
  * Scale shape: one scan → the |weeks × types| census (wall-time
  * frame, the X202 economics) → k-row-partition windows → two tiny
  * folds.
  */
object FriedmanTest {

  /** q265 — Friedman test of event types across weekly blocks. */
  val q265 = GraftQuery(
    "q265_friedman", {
      (s, d) => {
        val weekly = t(s, d, "events")
          .groupBy((epochDay(col("ts")) - pmod(epochDay(col("ts")),
            lit(7L))).as("wk"), col("event_type").as("trt"))
          .agg(count(lit(1)).as("x"))
        val kAll = weekly.agg(countDistinct(col("trt")).as("k"))
        val complete = weekly.join(broadcast(kAll))
          .withColumn("blk_n",
            count(lit(1)).over(Window.partitionBy(col("wk"))))
          .filter(col("blk_n") === col("k"))
        val wOrd = Window.partitionBy(col("wk")).orderBy(col("x"))
        val ranked = complete
          .withColumn("rnk", rank().over(wOrd).cast("long"))
          .withColumn("t", count(lit(1)).over(
            Window.partitionBy(col("wk"), col("x"))))
          .withColumn("r2", lit(2L) * col("rnk") + col("t") - 1L)
        // ONE pass over the ranked frame: the block census (n, Σr2²)
        // folds into the per-treatment aggregation (every treatment
        // sees all n complete blocks, so max of the per-trt distinct
        // block counts IS n) — r19 census trimmed the second branch
        val perTrt = ranked.groupBy(col("trt"))
          .agg(sum(col("r2")).as("r2j"),
            sum(col("r2") * col("r2")).as("r2sq"),
            countDistinct(col("wk")).as("n_t"), max(col("k")).as("k"))
        perTrt.agg(sum(col("r2j") * col("r2j")).as("s_rj2"),
            sum(col("r2sq")).as("s_r2sq"), max(col("n_t")).as("n"),
            max(col("k")).as("k"))
          .withColumn("num",
            (col("k") - 1L).cast("double") *
              (col("s_rj2").cast("double") -
                col("n").cast("double") * col("n").cast("double") *
                  col("k").cast("double") *
                  ((col("k") + 1L) * (col("k") + 1L)).cast("double")))
          .withColumn("den",
            col("s_r2sq").cast("double") -
              col("n").cast("double") * col("k").cast("double") *
                ((col("k") + 1L) * (col("k") + 1L)).cast("double"))
          .withColumn("crit",
            expr(ChiSqCrit.sparkCase("k - 1", "friedman")))
          .select(col("n"), col("k"),
            when(col("den") > 0d, round(col("num") / col("den"), 6))
              .as("chi2_r"),
            (when(col("den") > 0d, round(col("num") / col("den"), 6)) >
              col("crit")).as("significant"))
      }
    },
    Some(s"""
      WITH weekly AS (
        SELECT (CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400)
                 - ((CAST(epoch(date_trunc('day', ts)) AS BIGINT)
                    // 86400) % 7) AS wk,
               event_type AS trt, COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      kall AS (SELECT COUNT(DISTINCT trt) AS k FROM weekly),
      complete AS (
        SELECT wk, trt, x, k
        FROM (SELECT wk, trt, x, k,
                     COUNT(*) OVER (PARTITION BY wk) AS blk_n
              FROM weekly CROSS JOIN kall)
        WHERE blk_n = k),
      ranked AS (
        SELECT wk, trt, k,
               2 * RANK() OVER (PARTITION BY wk ORDER BY x)
                 + COUNT(*) OVER (PARTITION BY wk, x) - 1 AS r2
        FROM complete),
      pertrt AS (
        SELECT trt, CAST(SUM(r2) AS BIGINT) AS r2j, MAX(k) AS k
        FROM ranked GROUP BY 1),
      byblock AS (
        SELECT COUNT(DISTINCT wk) AS n,
               CAST(SUM(r2 * r2) AS BIGINT) AS s_r2sq
        FROM ranked),
      folded AS (
        SELECT CAST(SUM(r2j * r2j) AS BIGINT) AS s_rj2,
               MAX(k) AS k FROM pertrt),
      stats AS (
        SELECT n, k,
               CAST(k - 1 AS DOUBLE) * (CAST(s_rj2 AS DOUBLE)
                 - CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(k AS DOUBLE)
                   * CAST((k + 1) * (k + 1) AS DOUBLE)) AS num,
               CAST(s_r2sq AS DOUBLE) - CAST(n AS DOUBLE)
                 * CAST(k AS DOUBLE)
                 * CAST((k + 1) * (k + 1) AS DOUBLE) AS den,
               ${ChiSqCrit.duckCase("k - 1", "friedman")} AS crit
        FROM folded CROSS JOIN byblock)
      SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             CASE WHEN den > 0 THEN round(num / den, 6) END AS chi2_r,
             CASE WHEN den > 0 THEN round(num / den, 6) END > crit
               AS significant
      FROM stats
    """))

  val all: Seq[GraftQuery] = Seq(q265)
}
