package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity join (the AllPairs/PPJoin
  * family: Chaudhuri et al. ICDE 2006's prefix filter, Bayardo et al.
  * WWW 2007, Xiao et al. WWW 2008) — the published fix for the one
  * quadratic face the engine had left: q42's inverted-index self-join
  * pays Σ df² candidate rows per shingle, and the df² of stop-word
  * shingles dominates as the corpus grows.
  *
  * Principle: under ANY global shingle ordering, two sets with Jaccard
  * ≥ τ must share an element among the first |x| − ⌈τ·|x|⌉ + 1 of each
  * side (were all shared elements later, the overlap couldn't reach
  * ⌈τ·|x|⌉). Ordering by ASCENDING document frequency puts the
  * heaviest shingles LAST, so they drop out of the join entirely: the
  * candidate face becomes Σ df_prefix² over rare shingles — matches,
  * not corpus².
  *
  * Exactness: the filter is LOSSLESS for true Jaccard ≥ τ; because the
  * downstream report keeps pairs by the ROUNDED value (round(J,4) ≥
  * τ), the prefix runs at τ − 5e-5 — the exact lower bound of values
  * that round up — so boundary pairs cannot be missed. Candidates are
  * then verified EXACTLY: each pair fetches the two docs' shingle
  * arrays (∝ doc length, bounded — the same per-doc unit every dedup
  * stage tokenizes) and counts the true intersection with one
  * codegen'd array_intersect probe; nothing broadcast, and the pair
  * frame shuffles once per side.
  *
  * Positional-filter losslessness: with O = |A∩B| and J ≥ τ, O ≥
  * τ·(n_a+n_b−O) gives O ≥ τ/(1+τ)·(n_a+n_b) and O ≥ ⌈τ·n_a⌉ (n_b ≥ O).
  * The doc-local rarity order is the GLOBAL (df, shingle) order
  * restricted to the doc, so the first common element e₁ is the same
  * element in both docs; its rank satisfies rn_a(e₁) ≤ n_a − O + 1 ≤
  * prefix length (O elements occupy distinct ranks), so e₁'s collision
  * row exists, and every other common element sits after e₁ in BOTH
  * docs, giving O ≤ 1 + min(n_a−rn_a, n_b−rn_b) on that row. A true
  * pair therefore always has at least one collision row passing both
  * join-time bounds.
  *
  * Scale shape: df counting and the prefix rank are one extra
  * aggregation and one doc_id-partitioned sort over shingle rows (both
  * map-side-combinable / spillable); the self-join face shrinks from
  * Σ df² to Σ df_prefix²; verification shuffles only candidate docs'
  * shingles. Output is IDENTICAL to the brute inverted join — q42's
  * DuckDB oracle is unchanged and PpJoinSpec pins equality on random
  * corpora.
  */
object PpJoin {

  /** Cost-dispatched exact pair join: measures the brute inverted
    * join's EXACT candidate face — Σ df² rows, one tiny agg over the
    * df frame (IncrementalDedup's eager-gate precedent) — and picks
    * the algorithm. Flat-df corpora (fan-out Σdf²/rows ≈ mean df,
    * single digits — the synthetic tables measure ~10) run the brute
    * co-occurrence join, which IS the optimal exact plan when there is
    * no tail to prune: counting collisions directly beats paying the
    * df-rank machinery plus a verify probe per candidate (measured
    * 0.7×/0.4× in ProfileJaccard). Boilerplate-skewed corpora — every
    * real crawl — explode the fan-out with the df² of corpus-wide
    * shingles (the 12-word-suffix regime measures ~800) and run the
    * prefix path (measured 7–20×). Both branches return IDENTICAL
    * rows, so the dispatch is invisible to semantics and oracles.
    */
  def jaccardPairsAuto(sh: DataFrame, tau: Double,
      bruteFanoutMax: Double = 64.0): DataFrame = {
    val face = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df")).as("sq"), sum(col("df")).as("rows"))
      .head()
    val flat = face.isNullAt(0) ||
      face.getLong(0) <= bruteFanoutMax * face.getLong(1)
    if (flat) DedupQueries.bruteJaccardPairs(sh, tau)
    else jaccardPairs(sh, tau)
  }

  /** All pairs with round(jaccard, 4) ≥ tau over distinct per-doc
    * shingles: (doc_a, doc_b, n_inter, jaccard), doc_a < doc_b.
    * `sh` is a (doc_id, shingle) frame with set semantics.
    */
  def jaccardPairs(sh: DataFrame, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"ppjoin needs tau in (0,1], got $tau")
    // the rounding boundary: round(J,4) ≥ tau ⟺ J ≥ tau − 5e-5
    val tauLow = tau - 5e-5
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("shingle"))
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(byRarity))
      .join(sizes, "doc_id")
      .filter(col("rn") <=
        col("n_sh") - ceil(lit(tauLow) * col("n_sh")) + 1)
      .select(col("doc_id"), col("shingle"), col("rn"), col("n_sh"))
    // Collision-time pruning (both LOSSLESS, both evaluated inside the
    // join so pruned rows never reach the distinct):
    //  - size filter: J ≤ min/max of the two set sizes, so a qualifying
    //    pair has τ·|larger| ≤ |smaller|;
    //  - positional filter (Xiao et al.'s ppjoin bound): the FIRST
    //    common element under the global order collides at ranks
    //    (rn_a, rn_b) with every other common element after it in BOTH
    //    docs, so O ≤ 1 + min(n_a−rn_a, n_b−rn_b); J ≥ τ needs
    //    O ≥ τ/(1+τ)·(n_a+n_b). A pair's first-common-element row always
    //    satisfies both (proof in scaladoc), so ANY-row survival keeps
    //    every true pair.
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n_sh") >= ceil(lit(tauLow) * col("b.n_sh")) &&
          col("b.n_sh") >= ceil(lit(tauLow) * col("a.n_sh")) &&
          (lit(1) + least(col("a.n_sh") - col("a.rn"),
            col("b.n_sh") - col("b.rn"))) >=
            ceil(lit(tauLow / (1 + tauLow)) *
              (col("a.n_sh") + col("b.n_sh"))))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verification: one per-doc shingle array (∝ doc length,
    // bounded) joined to each side of the candidate pair, intersection
    // counted by a single codegen'd array_intersect probe per pair —
    // NOT by re-expanding pairs into per-shingle rows, whose groupBy
    // face (candidates × doc size) dominated the flat-df regime. The
    // arrays also carry the set sizes, so the two sizes joins vanish.
    val docSets = sh.groupBy(col("doc_id"))
      .agg(collect_list(col("shingle")).as("shs"))
    cand
      .join(docSets.select(col("doc_id").as("doc_a"),
        col("shs").as("shs_a")), "doc_a")
      .join(docSets.select(col("doc_id").as("doc_b"),
        col("shs").as("shs_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("shs_a"), col("shs_b")))
          .cast("long").as("n_inter"),
        size(col("shs_a")).as("n_a"), size(col("shs_b")).as("n_b"))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("jaccard"))
  }
}
