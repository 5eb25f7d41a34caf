package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X218 — Jensen–Shannon divergence (Lin 1991) between each source's
  * two ingest halves' language mixes: JSD(P, Q) = ½KL(P‖M) + ½KL(Q‖M),
  * M = (P+Q)/2 — the bounded, symmetric, zero-tolerant divergence the
  * drift tier was missing: q205's KS needs a continuous metric, q232's
  * EMD needs an ordered support, q162's χ² blows up on empty cells;
  * JSD is THE standard categorical-mixture drift score (0 ≤ JSD ≤
  * ln 2, defined even when a category exists in only one half). Here:
  * does a source's language mix differ between its even and odd
  * doc_id BLOCKS (doc_id div 20 parity — raw parity would be
  * degenerate against this schema's doc_id-mod-source layout) — a
  * shard-consistency audit (a sharded crawl whose halves disagree was
  * not shuffled the way its manifest claims).
  *
  * Determinism: counts are exact longs; each language's term
  *   p·ln(2p/(p+q)) + q·ln(2q/(p+q))
  * is one fixed double tree over those longs (zero-sided terms are
  * exactly 0 by the guard, not a limit); the cross-language sum
  * travels as DECIMAL(30,14) (the q162/q95 recipe), then one final
  * halving. Sources with an empty half are excluded (no mixture to
  * compare — stated).
  *
  * Scale shape: one map-side groupBy to the |sources × langs| frame;
  * everything else runs on that dimension frame. Corpus touched once.
  */
object JsDivergence {

  /** q251 — per-source language-mix JSD between doc_id parity halves. */
  val q251 = GraftQuery(
    "q251_js_drift", {
      (s, d) => {
        val cells = t(s, d, "documents")
          .groupBy(col("source"), col("lang"))
          .agg(
            // BLOCK parity, not doc_id parity: source is doc_id mod
            // |sources| in this schema, so raw parity puts every doc
            // of a source in ONE half (measured — the split must be
            // independent of the source axis)
            sum(when(pmod(expr("doc_id div 20"), lit(2)) === 0, 1L)
              .otherwise(0L)).as("c1"),
            sum(when(pmod(expr("doc_id div 20"), lit(2)) === 1, 1L)
              .otherwise(0L)).as("c2"))
        val totals = cells.groupBy(col("source"))
          .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
          .filter(col("n1") > 0L && col("n2") > 0L)
        val terms = cells.join(totals, "source")
          .withColumn("p", col("c1").cast("double") /
            col("n1").cast("double"))
          .withColumn("q", col("c2").cast("double") /
            col("n2").cast("double"))
          .withColumn("term",
            when(col("p") > 0d,
              col("p") * log(lit(2.0d) * col("p") /
                (col("p") + col("q")))).otherwise(0.0d) +
              when(col("q") > 0d,
                col("q") * log(lit(2.0d) * col("q") /
                  (col("p") + col("q")))).otherwise(0.0d))
        terms.groupBy(col("source"))
          .agg(max(col("n1")).as("n_even"), max(col("n2")).as("n_odd"),
            sum(when(col("c1") + col("c2") > 0L, 1L).otherwise(0L))
              .as("n_langs"),
            (sum(col("term").cast("decimal(30,14)")).cast("double") /
              2.0d).as("jsd_raw"))
          .select(col("source"), col("n_even"), col("n_odd"),
            col("n_langs"), round(col("jsd_raw"), 6).as("jsd"),
            (round(col("jsd_raw"), 6) > 0.05d).as("drifted"))
          .orderBy(col("source"))
      }
    },
    Some("""
      WITH cells AS (
        SELECT source, lang,
               CAST(SUM(CASE WHEN (doc_id // 20) % 2 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN (doc_id // 20) % 2 = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM documents GROUP BY 1, 2),
      totals AS (
        SELECT source, CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2
        FROM cells GROUP BY 1
        HAVING SUM(c1) > 0 AND SUM(c2) > 0),
      terms AS (
        SELECT c.source, t.n1, t.n2, c.c1, c.c2,
               CAST(c.c1 AS DOUBLE) / CAST(t.n1 AS DOUBLE) AS p,
               CAST(c.c2 AS DOUBLE) / CAST(t.n2 AS DOUBLE) AS q
        FROM cells c JOIN totals t USING (source)),
      folded AS (
        SELECT source, MAX(n1) AS n_even, MAX(n2) AS n_odd,
               CAST(SUM(CASE WHEN c1 + c2 > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_langs,
               CAST(SUM(CAST(
                 CASE WHEN p > 0 THEN p * ln(2.0 * p / (p + q))
                   ELSE 0.0 END
                 + CASE WHEN q > 0 THEN q * ln(2.0 * q / (p + q))
                   ELSE 0.0 END
                 AS DECIMAL(30,14))) AS DOUBLE) / 2.0 AS jsd_raw
        FROM terms GROUP BY source)
      SELECT source, n_even, n_odd, n_langs,
             round(jsd_raw, 6) AS jsd,
             round(jsd_raw, 6) > 0.05 AS drifted
      FROM folded
      ORDER BY source
    """))

  val all: Seq[GraftQuery] = Seq(q251)
}
