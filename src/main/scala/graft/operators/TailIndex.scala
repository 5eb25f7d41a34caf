package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X212 — Hill tail-index audit (Hill 1975, Annals of Statistics; the
  * standard estimator of a distribution's power-law tail exponent):
  * per order priority, α̂ = k / Σ_{i≤k} ln(x_(i) / x_(k+1)) over the
  * k largest order totals — HOW heavy is this group's upper tail.
  * The tail-SHAPE companion to X208's trimmed means (q241 reports how
  * much the whales move the average; this reports whether the whale
  * supply is a power law and how fast it decays): α̂ < 2 means
  * infinite variance — sample means don't converge, sampling plans
  * and mean-based SLAs are unsound for the group (flagged).
  *
  * Determinism (the q134 sorted-fold idiom): the tail set is pinned
  * by a (price DESC, orderkey) rank window; the k ln-ratio terms are
  * folded LEFT over the ascending-sorted tail array with an explicit
  * `aggregate` in Spark and the identical `list_reduce` in DuckDB —
  * one fixed double tree, no order-sensitive float sum ever crosses
  * an aggregation boundary. All-tied tails (Σ exactly 0) → guarded
  * NULLs; groups below [[MinN]] rows are excluded (a tail estimate
  * needs bulk to stand on — stated).
  *
  * Scale shape: one rank window sharing q241's per-group exchange,
  * then the k+1-row-per-group tail drives everything — collect_list
  * is bounded at k+1 elements per group by the rank filter.
  */
object TailIndex {

  /** Tail order statistics used by the estimator. */
  val K = 50

  /** Minimum group size (4·K) for an estimate to be emitted. */
  val MinN: Long = 4L * K

  /** q245 — per-priority Hill tail exponent of order totals. */
  val q245 = GraftQuery(
    "q245_tail_index", {
      (s, d) => {
        val w = Window.partitionBy(col("pri"))
          .orderBy(col("price").desc, col("o_orderkey"))
        val cw = Window.partitionBy(col("pri"))
        val ranked = t(s, d, "orders")
          .select(col("o_orderpriority").as("pri"), col("o_orderkey"),
            col("o_totalprice").cast("double").as("price"))
          .withColumn("r", row_number().over(w))
          .withColumn("n", count(lit(1)).over(cw))
        ranked
          .filter(col("r") <= K + 1 && col("n") >= MinN)
          .groupBy(col("pri"))
          .agg(max(col("n")).as("n"),
            array_sort(collect_list(col("price"))).as("xs"))
          .withColumn("k_eff", (size(col("xs")) - 1).cast("long"))
          .withColumn("x_kp1", element_at(col("xs"), 1))
          .withColumn("log_sum", aggregate(
            slice(col("xs"), 2, K),
            lit(0.0d), (acc, x) => acc + log(x / col("x_kp1"))))
          .select(col("pri"), col("n"), col("k_eff"),
            col("x_kp1").as("tail_threshold"),
            expr("case when log_sum > 0.0 then " +
              "cast(k_eff as double) / log_sum end").as("alpha"),
            expr("case when log_sum > 0.0 then " +
              "cast(k_eff as double) / log_sum < 2.0 end")
              .as("infinite_variance"))
          .orderBy(col("pri"))
      }
    },
    Some(s"""
      WITH ranked AS (
        SELECT o_orderpriority AS pri, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY CAST(o_totalprice AS DOUBLE) DESC,
                          o_orderkey) AS r,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders),
      grp AS (
        SELECT pri, MAX(n) AS n, list_sort(list(price)) AS xs
        FROM ranked
        WHERE r <= ${K + 1} AND n >= $MinN
        GROUP BY pri),
      folded AS (
        SELECT pri, n, len(xs) - 1 AS k_eff, xs[1] AS x_kp1,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(xs[2:${K + 1}],
                   x -> ln(x / xs[1]))),
                 (acc, v) -> acc + v) AS log_sum
        FROM grp)
      SELECT pri, n, CAST(k_eff AS BIGINT) AS k_eff,
             x_kp1 AS tail_threshold,
             CASE WHEN log_sum > 0.0 THEN
               CAST(k_eff AS DOUBLE) / log_sum END AS alpha,
             CASE WHEN log_sum > 0.0 THEN
               CAST(k_eff AS DOUBLE) / log_sum < 2.0 END
               AS infinite_variance
      FROM folded
      ORDER BY pri
    """))

  val all: Seq[GraftQuery] = Seq(q245)
}
