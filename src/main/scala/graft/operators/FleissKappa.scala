package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X227 — Fleiss' kappa (Fleiss, Psych. Bulletin 1971): chance-
  * corrected agreement STRENGTH among m ≥ 3 raters on the same
  * subjects — the multi-rater upgrade of X108's two-rater Cohen κ
  * (q155), and the complement of X226's Cochran Q on the same gate
  * battery: Q asks whether the gates' pass RATES differ (marginal
  * homogeneity); κ asks how often they agree on the SAME document
  * beyond chance. A battery can pass Q (equal rates) while agreeing
  * barely above coin flips — both numbers gate a "replace the
  * ensemble with one gate" decision.
  *
  * Raters: the q258 battery ([[CochranQ.gates]], shared code AND
  * shared oracle CTE, so the two tests read the same ballots);
  * categories {pass, fail}, m = 3.
  *
  * Determinism: per-document agreement Σ_j n_ij² − m is an exact long
  * (A = Σ_i (r_i² + (m−r_i)² − m)); the marginals S = Σr are exact
  * longs; κ = (P̄ − P̄_e)/(1 − P̄_e) is ONE fixed double tree over
  * those longs (squares taken AFTER the double cast — long squares of
  * 3N-scale counts would overflow Spark's ANSI int64 while DuckDB
  * silently promotes to HUGEINT, the one cross-engine divergence this
  * tier must never touch). Perfect chance degeneracy (P̄_e = 1: every
  * ballot identical on every document) → NULL.
  *
  * Scale shape: one corpus scan → one map-side-combined global
  * aggregate; nothing else moves.
  */
object FleissKappa {

  val Raters = 3

  /** q259 — Fleiss κ of the three-gate battery on documents. */
  val q259 = GraftQuery(
    "q259_fleiss_kappa", {
      (s, d) => {
        val m = Raters
        def b2l(c: org.apache.spark.sql.Column) =
          when(c, 1L).otherwise(0L)
        val g = CochranQ.gates(t(s, d, "documents"))
          .withColumn("r", b2l(col("gate_a")) + b2l(col("gate_b")) +
            b2l(col("gate_c")))
        g.agg(count(lit(1)).as("n_docs"),
            sum(col("r")).as("s"),
            sum(col("r") * col("r") +
              (lit(m.toLong) - col("r")) * (lit(m.toLong) - col("r")) -
              lit(m.toLong)).as("a"))
          .withColumn("p_bar",
            col("a").cast("double") /
              (lit((m * (m - 1)).toDouble) * col("n_docs").cast("double")))
          .withColumn("p_e",
            (col("s").cast("double") * col("s").cast("double") +
              (lit(m.toLong) * col("n_docs") - col("s")).cast("double") *
                (lit(m.toLong) * col("n_docs") - col("s")).cast("double")) /
              (lit((m * m).toDouble) * col("n_docs").cast("double") *
                col("n_docs").cast("double")))
          .select(col("n_docs"), col("s").as("total_passes"),
            when(col("p_e") < 1.0d,
              round((col("p_bar") - col("p_e")) / (lit(1.0d) - col("p_e")),
                6)).as("kappa"),
            round(col("p_bar"), 6).as("p_bar_r"),
            round(col("p_e"), 6).as("p_e_r"))
      }
    },
    Some(s"""
      WITH ${CochranQ.gatesSql},
      rows_ AS (
        SELECT (CASE WHEN gate_a THEN 1 ELSE 0 END
                + CASE WHEN gate_b THEN 1 ELSE 0 END
                + CASE WHEN gate_c THEN 1 ELSE 0 END) AS r
        FROM gated),
      cells AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(r) AS BIGINT) AS s,
               CAST(SUM(r * r + (3 - r) * (3 - r) - 3) AS BIGINT) AS a
        FROM rows_),
      stats AS (
        SELECT n_docs, s,
               CAST(a AS DOUBLE) / (6.0 * CAST(n_docs AS DOUBLE))
                 AS p_bar,
               (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 + CAST(3 * n_docs - s AS DOUBLE)
                   * CAST(3 * n_docs - s AS DOUBLE))
                 / (9.0 * CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))
                 AS p_e
        FROM cells)
      SELECT n_docs, s AS total_passes,
             CASE WHEN p_e < 1.0 THEN
               round((p_bar - p_e) / (1.0 - p_e), 6) END AS kappa,
             round(p_bar, 6) AS p_bar_r,
             round(p_e, 6) AS p_e_r
      FROM stats
    """))

  val all: Seq[GraftQuery] = Seq(q259)
}
