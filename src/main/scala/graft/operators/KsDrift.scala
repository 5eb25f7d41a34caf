package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X166 — exact two-sample Kolmogorov-Smirnov drift statistic
  * (Kolmogorov 1933 / Smirnov 1939; the two-sample critical band per
  * Hodges, "The significance probability of the Smirnov two-sample
  * test", Ark. Mat. 1958): D = max |F̂_a(v) − F̂_b(v)| between two
  * sources' document-length distributions — the CONTINUOUS-
  * distribution drift test next to X85's categorical χ² (binning a
  * continuous feature before χ² throws away exactly the tail shifts
  * KS is sensitive to). The feed-onboarding question "does dump B's
  * length distribution match dump A's" is this statistic.
  *
  * Exactness: D is carried SCALED by n_a·n_b — D_scaled =
  * max |cum_a·n_b − cum_b·n_a|, an exact long (the classic
  * integer form of the KS statistic; no division until the render) —
  * and the α = 0.05 decision is ONE fixed double tree over exact
  * longs: reject ⇔ D_scaled² > c²·n_a·n_b·(n_a+n_b), c = 1.358
  * (c² = 1.843964). Ties are handled exactly: the running counts are
  * RANGE windows over the value, so every step point sees all rows of
  * equal value at once (the right-continuous empirical CDF).
  *
  * Shape: one map-side-combined groupBy to the (source, value) count
  * frame, a |pairs|-expansion of that DIMENSION frame (sources are a
  * handful; values ≤ distinct lengths), per-pair RANGE windows over
  * the value axis, one groupBy to |pairs| rows. The corpus is scanned
  * once; nothing corpus-sized shuffles.
  */
object KsDrift {

  /** c² for α = 0.05 two-sample KS (c = 1.358). */
  val CSquared = 1.358 * 1.358

  /** q205 — pairwise cross-source KS over document lengths. */
  val q205 = GraftQuery(
    "q205_ks_drift", {
      (s, d) => {
        val counts = t(s, d, "documents")
          .groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c"))
        val totals = counts.groupBy(col("source"))
          .agg(sum(col("c")).as("n"))
        val srcs = totals.select(col("source").as("src_a"),
            col("n").as("n_a"))
          .crossJoin(totals.select(col("source").as("src_b"),
            col("n").as("n_b")))
          .filter(col("src_a") < col("src_b"))
        val sided = srcs
          .join(counts, col("source") === col("src_a") ||
            col("source") === col("src_b"))
          .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
            col("v"),
            when(col("source") === col("src_a"), col("c"))
              .otherwise(0L).as("ca"),
            when(col("source") === col("src_b"), col("c"))
              .otherwise(0L).as("cb"))
        val w = Window.partitionBy(col("src_a"), col("src_b"))
          .orderBy(col("v"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        sided
          .withColumn("cum_a", sum(col("ca")).over(w))
          .withColumn("cum_b", sum(col("cb")).over(w))
          .withColumn("gap",
            abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .groupBy(col("src_a"), col("src_b"))
          .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
            max(col("gap")).as("d_scaled"))
          .withColumn("d",
            expr("cast(d_scaled as double) / " +
              "(cast(n_a as double) * cast(n_b as double))"))
          .withColumn("reject_05", expr(
            s"cast(d_scaled as double) * cast(d_scaled as double) > " +
              s"$CSquared * cast(n_a as double) * cast(n_b as double)" +
              s" * cast(n_a + n_b as double)"))
          .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
            col("d_scaled"), col("d"), col("reject_05"))
          .orderBy(col("src_a"), col("src_b"))
      }
    },
    Some(s"""
      WITH counts AS (
        SELECT source, n_chars AS v, COUNT(*) AS c
        FROM documents GROUP BY 1, 2),
      totals AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n
        FROM counts GROUP BY 1),
      pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               a.n AS n_a, b.n AS n_b
        FROM totals a JOIN totals b ON a.source < b.source),
      sided AS (
        SELECT p.src_a, p.src_b, p.n_a, p.n_b, c.v,
               CASE WHEN c.source = p.src_a THEN c.c ELSE 0 END AS ca,
               CASE WHEN c.source = p.src_b THEN c.c ELSE 0 END AS cb
        FROM pairs p JOIN counts c
          ON c.source = p.src_a OR c.source = p.src_b),
      cum AS (
        SELECT src_a, src_b, n_a, n_b,
               abs(SUM(ca) OVER w * n_b - SUM(cb) OVER w * n_a) AS gap
        FROM sided
        WINDOW w AS (PARTITION BY src_a, src_b ORDER BY v
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT src_a, src_b, n_a, n_b,
             CAST(MAX(gap) AS BIGINT) AS d_scaled,
             CAST(MAX(gap) AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d,
             CAST(MAX(gap) AS DOUBLE) * CAST(MAX(gap) AS DOUBLE) >
               $CSquared * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
               * CAST(n_a + n_b AS DOUBLE) AS reject_05
      FROM cum
      GROUP BY 1, 2, 3, 4
      ORDER BY src_a, src_b
    """))

  val all: Seq[GraftQuery] = Seq(q205)
}
