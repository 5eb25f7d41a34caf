package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** X208 — trimmed / winsorized mean audit (Tukey's robust location
  * estimators; Dixon & Tukey 1968 for winsorization): per order
  * priority, the raw mean of o_totalprice next to its 5 %-trimmed
  * mean (drop the k = ⌊n/20⌋ smallest and largest) and 5 %-winsorized
  * mean (CLAMP them to the k+1-th / n−k-th order statistics), plus
  * the raw−trimmed gap — the one-line answer to "is this group's
  * average a few whales in a trenchcoat". The LOCATION-estimate
  * sibling of X137's MAD outlier gate (q139 flags rows; this reports
  * how much the flagged tail actually moves the headline number) and
  * the exact counterpart of q75's sketched quantiles.
  *
  * Exactness: one total-order rank per group (price, orderkey), all
  * sums in DECIMAL(18,2) (exact, associative — the Q.dsum
  * discipline); the winsorized sum is trimmed_sum + k·(low + high)
  * in decimal, so every mean is ONE double division of exact leaves.
  * k = 0 (n < 20) degrades all three means to the raw mean by
  * construction — no special case.
  *
  * Scale shape: one group-partitioned rank window (per-group local
  * sort — the q39 exchange), one conditional-sum groupBy to the
  * |groups| frame. Scan-bound.
  */
object TrimmedMean {

  /** q241 — robust-location audit of order totals per priority. */
  val q241 = GraftQuery(
    "q241_trimmed_mean", {
      (s, d) => {
        val w = Window.partitionBy(col("pri"))
          .orderBy(col("price"), col("o_orderkey"))
        val cw = Window.partitionBy(col("pri"))
        val ranked = t(s, d, "orders")
          .select(col("o_orderpriority").as("pri"), col("o_orderkey"),
            col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
          .withColumn("r", row_number().over(w).cast("long"))
          .withColumn("cnt", count(lit(1)).over(cw))
          .withColumn("k", expr("cnt div 20"))
        ranked
          .groupBy(col("pri"))
          .agg(max(col("cnt")).as("n"), max(col("k")).as("k"),
            sum(col("price")).as("sum_all"),
            sum(when(col("r") > col("k") &&
              col("r") <= col("cnt") - col("k"), col("price")))
              .as("trim_sum"),
            sum(when(col("r") > col("k") &&
              col("r") <= col("cnt") - col("k"), 1L).otherwise(0L))
              .as("n_kept"),
            max(when(col("r") === col("k") + 1, col("price")))
              .as("low"),
            max(when(col("r") === col("cnt") - col("k"), col("price")))
              .as("high"))
          .select(col("pri"), col("n"), col("k"),
            (col("sum_all").cast("double") / col("n").cast("double"))
              .as("mean_raw"),
            (col("trim_sum").cast("double") /
              col("n_kept").cast("double")).as("mean_trimmed"),
            ((col("trim_sum") + (col("low") + col("high")) * col("k"))
              .cast("double") / col("n").cast("double"))
              .as("mean_winsorized"),
            (col("sum_all").cast("double") / col("n").cast("double") -
              col("trim_sum").cast("double") /
                col("n_kept").cast("double")).as("tail_pull"))
          .orderBy(col("pri"))
      }
    },
    Some("""
      WITH ranked AS (
        SELECT o_orderpriority AS pri,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY CAST(o_totalprice AS DECIMAL(18,2)),
                          o_orderkey) AS r,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
        FROM orders),
      kd AS (SELECT *, cnt // 20 AS k FROM ranked),
      grp AS (
        SELECT pri, MAX(cnt) AS n, MAX(k) AS k,
               SUM(price) AS sum_all,
               SUM(CASE WHEN r > k AND r <= cnt - k THEN price END)
                 AS trim_sum,
               CAST(SUM(CASE WHEN r > k AND r <= cnt - k
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               MAX(CASE WHEN r = k + 1 THEN price END) AS low,
               MAX(CASE WHEN r = cnt - k THEN price END) AS high
        FROM kd GROUP BY pri)
      SELECT pri, n, k,
             CAST(sum_all AS DOUBLE) / CAST(n AS DOUBLE) AS mean_raw,
             CAST(trim_sum AS DOUBLE) / CAST(n_kept AS DOUBLE)
               AS mean_trimmed,
             CAST(trim_sum + (low + high) * k AS DOUBLE)
               / CAST(n AS DOUBLE) AS mean_winsorized,
             CAST(sum_all AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(trim_sum AS DOUBLE) / CAST(n_kept AS DOUBLE)
               AS tail_pull
      FROM grp
      ORDER BY pri
    """))

  val all: Seq[GraftQuery] = Seq(q241)
}
