package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X196 — exact 1-D earth-mover (Wasserstein-1) drift between two
  * sources' length distributions (Monge 1781 / Kantorovich 1942; the
  * drift metric modern ML monitoring standardized on): W₁ = ∫|F_A −
  * F_B| dx, the total CDF displacement — the AREA companion to
  * X166's KS (KS reads the single largest gap and saturates; W₁
  * keeps growing with how FAR mass moved, the property that makes it
  * the alerting metric while KS is the test). The SIGNED area rides
  * along: ∫(F_A − F_B) dx = E[B] − E[A] exactly, so the report says
  * not just "moved" but "which way and by how many characters on
  * average".
  *
  * Exactness: per value the CDF gap is the X166 scaled long
  * |cum_a·n_b − cum_b·n_a|; each step's area term multiplies by the
  * integer gap to the NEXT distinct value (the final step is
  * provably 0 — both scaled CDFs equal n_a·n_b there — so the lead's
  * NULL needs no special case beyond a coalesce); the scaled sum is
  * bounded by n_a·n_b·range(v) ≈ 1.9e15 at the sf1 decade — inside
  * long with two orders of headroom (stated); W₁ and the mean shift
  * are one double division each.
  *
  * Scale shape: identical to X166 (shared frame discipline): one
  * corpus scan → (source, value) dimension frame → |pairs| expansion
  * + per-pair RANGE windows + one lead window on that frame only.
  */
object EmdDrift {

  /** q232 — pairwise cross-source W₁ over document lengths. */
  val q232 = GraftQuery(
    "q232_emd_drift", {
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
          // both sources can carry the same v: collapse to ONE row per
          // (pair, v) so the lead window steps distinct values
          .groupBy(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
            col("v"))
          .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
        val wCum = Window.partitionBy(col("src_a"), col("src_b"))
          .orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wLead = Window.partitionBy(col("src_a"), col("src_b"))
          .orderBy(col("v"))
        sided
          .withColumn("cum_a", sum(col("ca")).over(wCum))
          .withColumn("cum_b", sum(col("cb")).over(wCum))
          .withColumn("dv",
            coalesce(lead(col("v"), 1).over(wLead) - col("v"), lit(0L)))
          .withColumn("signed",
            (col("cum_a") * col("n_b") - col("cum_b") * col("n_a")) *
              col("dv"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
            sum(abs(col("signed"))).as("emd_scaled"),
            sum(col("signed")).as("signed_scaled"))
          .withColumn("emd",
            col("emd_scaled").cast("double") /
              (col("n_a").cast("double") * col("n_b").cast("double")))
          .withColumn("mean_shift",
            col("signed_scaled").cast("double") /
              (col("n_a").cast("double") * col("n_b").cast("double")))
          .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
            col("emd_scaled"), col("emd"), col("mean_shift"))
          .orderBy(col("src_a"), col("src_b"))
      }
    },
    Some("""
      WITH counts AS (
        SELECT source, n_chars AS v, COUNT(*) AS c
        FROM documents GROUP BY 1, 2),
      totals AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n
        FROM counts GROUP BY 1),
      pairs AS (
        SELECT a.source AS src_a, a.n AS n_a,
               b.source AS src_b, b.n AS n_b
        FROM totals a, totals b WHERE a.source < b.source),
      sided AS (
        SELECT p.src_a, p.src_b, p.n_a, p.n_b, c.v,
               CAST(SUM(CASE WHEN c.source = p.src_a THEN c.c ELSE 0
                 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN c.source = p.src_b THEN c.c ELSE 0
                 END) AS BIGINT) AS cb
        FROM pairs p JOIN counts c
          ON c.source = p.src_a OR c.source = p.src_b
        GROUP BY 1, 2, 3, 4, 5),
      stepped AS (
        SELECT src_a, src_b, n_a, n_b,
               (CAST(SUM(ca) OVER w_cum AS BIGINT) * n_b -
                CAST(SUM(cb) OVER w_cum AS BIGINT) * n_a) *
                 COALESCE(LEAD(v, 1) OVER w_lead - v, 0) AS signed
        FROM sided
        WINDOW w_cum AS (PARTITION BY src_a, src_b ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_lead AS (PARTITION BY src_a, src_b ORDER BY v))
      SELECT src_a, src_b, n_a, n_b,
             CAST(SUM(ABS(signed)) AS BIGINT) AS emd_scaled,
             CAST(SUM(ABS(signed)) AS DOUBLE) /
               (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS emd,
             CAST(SUM(signed) AS DOUBLE) /
               (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
               AS mean_shift
      FROM stepped
      GROUP BY src_a, src_b, n_a, n_b
      ORDER BY src_a, src_b
    """))

  val all: Seq[GraftQuery] = Seq(q232)
}
