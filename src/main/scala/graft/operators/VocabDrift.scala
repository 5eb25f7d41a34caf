package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X103 — cross-dump vocabulary drift by squared Hellinger distance:
  * H² = 1 − Σ_w √(p_w·q_w) between two corpora's token distributions —
  * the distribution-shift alarm a crawl pipeline runs dump-over-dump
  * (a new boilerplate flood, a language-mix shift, or a scraper
  * regression all move token mass; per-token diffs drown in the Zipf
  * head, a proper f-divergence does not). Hellinger over
  * Jensen–Shannon deliberately: JSD needs ln(p) on RATIOS — not
  * reproducible cross-engine — while Hellinger needs only √ on
  * EXACT-INTEGER products (√ is IEEE correctly-rounded; ln is not),
  * the engine's α=0.5 determinism rule.
  *
  * Determinism: per-token counts are exact longs; the Bhattacharyya
  * sum Σ√(ca·cb) folds over the SORTED product array (equal products
  * are interchangeable terms — the q134 sorted-fold discipline), and
  * H² = 1 − Σ√(ca·cb)/(√NA·√NB) is one shared tree. Products
  * ca·cb ≤ NA·NB stay < 2⁵³ for the measured corpora; the normalizer
  * multiplies the two square roots instead of rooting the product so
  * no single long exceeds the exact-double range at scale.
  *
  * Scale shape: one token-count agg per side (map-side combined, the
  * engine's standard vocab shape), an equi-join on token, and a fold
  * over the SHARED-vocab frame — Heaps-law bounded like X68/X72, not
  * corpus-sized; the disjoint tails contribute zero to the sum and
  * are never materialized.
  */
object VocabDrift {

  /** q151 — Hellinger drift between the doc_id%2 halves of the corpus
    * (a same-distribution null at this data; planted-shift behavior is
    * spec territory): token masses, shared-vocab size, Bhattacharyya
    * coefficient, H².
    */
  val q151 = GraftQuery(
    "q151_vocab_drift", {
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(pmod(col("doc_id"), lit(2)).as("side"),
            explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val counts = toks.groupBy(col("tok"))
          .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("side") === 1, 1L).otherwise(0L)).as("cb"))
        val tot = counts.agg(
          sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
            .as("shared"),
          array_sort(collect_list(
            when(col("ca") > 0 && col("cb") > 0, col("ca") * col("cb"))))
            .as("prods"))
        tot
          .withColumn("bc", aggregate(col("prods"), lit(0.0d),
            (acc, p) => acc + sqrt(p.cast("double"))) /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .select(col("na"), col("nb"), col("shared"),
            round(col("bc"), 6).as("bhattacharyya_r"),
            round(lit(1.0d) - col("bc"), 6).as("hellinger_sq_r"))
      }
    },
    Some("""
      WITH toks AS (
        SELECT doc_id % 2 AS side, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      toks2 AS (SELECT side, tok FROM toks WHERE tok <> ''),
      counts AS (
        SELECT tok,
               sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
        FROM toks2 GROUP BY tok),
      tot AS (
        SELECT sum(ca) AS na, sum(cb) AS nb,
               sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
                 AS shared,
               list_sort(list(ca * cb) FILTER (ca > 0 AND cb > 0))
                 AS prods
        FROM counts),
      fin AS (
        SELECT na, nb, shared,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(prods, p -> sqrt(CAST(p AS DOUBLE)))),
                 (acc, v) -> acc + v) /
                 (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
                 AS bc
        FROM tot)
      SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             CAST(shared AS BIGINT) AS shared,
             round(bc, 6) AS bhattacharyya_r,
             round(1.0 - bc, 6) AS hellinger_sq_r
      FROM fin
    """))

  val all: Seq[GraftQuery] = Seq(q151)
}
