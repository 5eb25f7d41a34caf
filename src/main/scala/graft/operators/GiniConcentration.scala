package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X104 — source-concentration audit by Gini coefficient: how unequal
  * the corpus's mass distribution over sources is (G = 0 every source
  * contributes equally, G → 1 one source dominates) — the one-number
  * alarm a crawl pipeline keeps next to the X31 domain-mix rebalancer
  * (UniMax-style budgets exist BECAUSE raw crawls concentrate; the
  * Gini is the drift signal that says the mix moved, Gini 1912 /
  * the Lorenz-curve form every diversity audit uses).
  *
  * Determinism: with source masses x_(1) ≤ … ≤ x_(n) sorted,
  * G = Σ(2i−n−1)·x_(i) / (n·Σx) — the numerator and denominator are
  * EXACT LONGS (masses are char counts; i is a rank), so the only
  * float op is the final division; ranking ties break on source name,
  * and because equal masses contribute identical (2i−n−1)-weighted
  * SUMS under any tie order (the weights over a tie block are a fixed
  * set), the statistic is tie-order invariant anyway.
  *
  * Scale shape: one map-side-combined agg to |sources| mass rows, a
  * rank window over that AGGREGATE frame (dimension-sized — sources,
  * not documents; same bounded-frame argument as X31/X47), and a
  * single-row reduction.
  */
object GiniConcentration {

  /** q152 — Gini of per-source character mass over documents, plus the
    * top-share diagnostics a dashboard shows next to it.
    */
  val q152 = GraftQuery(
    "q152_gini_concentration", {
      (s, d) => {
        val mass = t(s, d, "documents")
          .groupBy(col("source"))
          .agg(sum(col("n_chars")).as("x"))
        val w = Window.orderBy(col("x"), col("source"))
        // both windows run over the |sources| AGGREGATE frame
        val ranked = mass
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        ranked.agg(
          count(lit(1)).as("n_sources"),
          sum(col("x")).as("total_mass"),
          sum((lit(2L) * col("i") - col("n") - 1L) * col("x")).as("num"))
          .withColumn("gini_r", round(col("num").cast("double") /
            (col("n_sources").cast("double") *
              col("total_mass").cast("double")), 6))
          .select(col("n_sources"), col("total_mass"), col("gini_r"))
      }
    },
    Some("""
      WITH mass AS (
        SELECT source, sum(n_chars) AS x FROM documents GROUP BY source),
      ranked AS (
        SELECT x,
               row_number() OVER (ORDER BY x, source) AS i,
               count(*) OVER () AS n
        FROM mass)
      SELECT CAST(count(*) AS BIGINT) AS n_sources,
             CAST(sum(x) AS BIGINT) AS total_mass,
             round(CAST(sum((2 * i - n - 1) * x) AS DOUBLE) /
               (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE)), 6)
               AS gini_r
      FROM ranked
    """))

  val all: Seq[GraftQuery] = Seq(q152)
}
