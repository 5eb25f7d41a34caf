package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** UniMax language sampling (Chung et al., "UniMax: Fairer and More
  * Effective Language Sampling for Large-Scale Multilingual
  * Pretraining", TACL 2023): distribute a token budget across
  * languages as evenly as possible WITHOUT repeating any language more
  * than `epochs` times — the waterfilling allocator that replaced
  * temperature sampling for mT5-class pretraining mixes.
  *
  * Closed form instead of the paper's loop: sort languages by capacity
  * c_l = epochs·n_l ascending. A language is capacity-capped iff its
  * capacity falls below an even split of what remains at its rank,
  * c_r < (B − P_{r−1}) / (L − r + 1) with P the running capacity sum —
  * the capped set is always a prefix of the sort (the waterfilling
  * lemma), so every uncapped language receives the same final level
  * (B − Σ capped c) / #uncapped. The iterative reference in
  * UniMaxSpec must agree exactly.
  *
  * Determinism discipline (Q.scala): capacities and prefix sums are
  * integer-exact longs; each level is ONE IEEE division of two
  * integer-exact values (bit-identical cross-engine); comparisons use
  * the unrounded level; only REPORTED columns are rounded.
  *
  * Scale shape: the only corpus-scale work is the per-language token
  * count — one map-side-combined aggregation of (lang, long) pairs
  * (q49's whitespace token definition). The allocator itself runs on
  * the post-agg frame of one row per LANGUAGE (dozens — q80's
  * planning-tier precedent), where the unpartitioned windows are safe
  * by construction.
  */
object UniMax {

  /** Waterfilling allocation of a fixed `budget` of tokens over
    * languages at an `epochs` repeat cap. Output per language: n_docs,
    * n_tokens, capacity, whether capacity-capped, allocated tokens,
    * epochs used, and the budget fraction, ordered by lang. Fails loud
    * on a non-positive budget or epochs rather than allocating
    * nonsense.
    */
  def allocate(docs: DataFrame, budget: Long, epochs: Int): DataFrame = {
    require(budget > 0, s"unimax needs budget > 0, got $budget")
    waterfill(byLang(docs, epochs).withColumn("budget", lit(budget)))
  }

  /** [[allocate]] with the budget derived IN-PLAN as `num/den` of the
    * corpus's total tokens (integer arithmetic, exact) — the form a
    * self-contained planning query wants, since a fixed budget would
    * need a driver-side count.
    */
  def allocateFraction(docs: DataFrame, num: Int, den: Int,
      epochs: Int): DataFrame = {
    require(num > 0 && den > 0, s"unimax needs a positive fraction")
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    waterfill(byLang(docs, epochs)
      .withColumn("total_tokens", sum(col("n_tokens")).over(whole))
      .withColumn("budget", expr(s"($num * total_tokens) div $den")))
  }

  private def byLang(docs: DataFrame, epochs: Int): DataFrame = {
    require(epochs > 0, s"unimax needs epochs > 0, got $epochs")
    docs
      .select(col("lang"),
        size(split(normalize(col("text")), " ")).cast("long").as("tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * epochs)
  }

  /** The closed-form waterfill over a (lang, n_docs, n_tokens,
    * capacity, budget) planning frame.
    */
  private def waterfill(frame: DataFrame): DataFrame = {
    // post-agg planning frame: one row per language — the windows
    // below never see the corpus
    val asc = Window.partitionBy().orderBy(col("capacity"), col("lang"))
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = frame
      .withColumn("r", row_number().over(asc))
      .withColumn("cum_before",
        coalesce(sum(col("capacity")).over(
          asc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_langs", count(lit(1)).over(whole))
      // the rank-r even split of what remains if every language from
      // rank r on were uncapped — one IEEE division of exact longs
      .withColumn("level_r",
        (col("budget") - col("cum_before")).cast("double") /
          (col("n_langs") - col("r") + 1).cast("double"))
      .withColumn("capped", col("capacity").cast("double") < col("level_r"))
    ranked
      .withColumn("capped_sum", coalesce(
        sum(when(col("capped"), col("capacity"))).over(whole), lit(0L)))
      .withColumn("n_uncapped",
        count(when(!col("capped"), lit(1))).over(whole))
      .withColumn("alloc",
        when(col("capped"), col("capacity").cast("double"))
          .otherwise((col("budget") - col("capped_sum")).cast("double") /
            col("n_uncapped").cast("double")))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("capacity"),
        col("capped"),
        round(col("alloc"), 4).as("alloc_tokens"),
        round(col("alloc") / col("n_tokens"), 6).as("epochs_used"),
        round(col("alloc") / col("budget"), 6).as("frac_budget"))
      .orderBy(col("lang"))
  }
}
