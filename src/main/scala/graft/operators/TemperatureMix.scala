package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X94 — square-root temperature sampling (the multilingual-mixing
  * baseline UniMax replaced): per language, sampling probability
  * p_l ∝ n_l^α with α = 0.5 — the exponent multilingual BERT/XLM-R
  * used to lift low-resource languages without drowning the head.
  * Shipping BOTH allocators (X39 waterfilling, this) is what lets a
  * pipeline A/B the mixing policy; the q144 report carries the
  * side-by-side epochs-per-language that makes UniMax's advantage
  * visible (temperature sampling over-repeats the tail — epochs
  * unbounded; UniMax caps them).
  *
  * Determinism: α = 0.5 is chosen deliberately — sqrt IS correctly
  * rounded under IEEE-754 (unlike pow/ln), so every weight is
  * bit-identical cross-engine; the weight sum folds over the SORTED
  * weight array (the X83 discipline — languages are few, the array
  * is planning-tier); each p and allocation is then one shared
  * expression tree over bit-identical inputs.
  *
  * Scale shape: corpus-sized work is the per-language token count
  * (map-side-combined (lang, long) agg — X39's exact shape); the
  * allocator runs on the |langs|-row frame.
  */
object TemperatureMix {

  /** Token budget to allocate (matches the X39 q109 report scale). */
  val Budget = 1000000L

  /** q144 — √-temperature allocation per language. */
  val q144 = GraftQuery(
    "q144_temperature_mix", {
      (s, d) => {
        val byLang = t(s, d, "documents")
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        // Σ w over the sorted weight array: deterministic fold order
        val total = byLang
          .agg(array_sort(collect_list(sqrt(col("n_tokens").cast("double"))))
            .as("ws"))
          .select(aggregate(col("ws"), lit(0.0d), (a, w) => a + w)
            .as("wsum"))
        byLang.join(broadcast(total))
          .withColumn("w", sqrt(col("n_tokens").cast("double")))
          .withColumn("p", col("w") / col("wsum"))
          .withColumn("alloc",
            floor(col("p") * Budget.toDouble).cast("long"))
          .withColumn("epochs", round(col("alloc").cast("double") /
            col("n_tokens").cast("double"), 4))
          .select(col("lang"), col("n_docs"), col("n_tokens"),
            round(col("p"), 6).as("p_r"), col("alloc"),
            col("epochs").as("epochs_r"))
          .orderBy(col("lang"))
      }
    },
    Some(s"""
      WITH bylang AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                 AS n_tokens
        FROM documents GROUP BY 1),
      tot AS (
        SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_sort(list(sqrt(CAST(n_tokens AS DOUBLE))))),
                 (a, w) -> a + w) AS wsum
        FROM bylang),
      alloc AS (
        SELECT b.lang, b.n_docs, b.n_tokens,
               sqrt(CAST(b.n_tokens AS DOUBLE)) / t.wsum AS p,
               CAST(floor(sqrt(CAST(b.n_tokens AS DOUBLE)) / t.wsum
                 * $Budget) AS BIGINT) AS alloc
        FROM bylang b CROSS JOIN tot t)
      SELECT lang, n_docs, n_tokens, round(p, 6) AS p_r, alloc,
             round(CAST(alloc AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
               AS epochs_r
      FROM alloc
      ORDER BY lang
    """))

  val all: Seq[GraftQuery] = Seq(q144)
}
