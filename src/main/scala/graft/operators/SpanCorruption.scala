package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** Span-corruption example generation — the denoising-objective prep
  * step of T5 (Raffel et al. JMLR 2020 §3.1.4; UL2's R/X-denoisers are
  * the same op at other rates): mask ~15 % of tokens in short
  * contiguous spans, replace each span with a numbered sentinel in the
  * input, and emit the masked content behind the matching sentinels as
  * the target. The LAST data transform before sequence packing (X30)
  * in an encoder-decoder pretraining pipeline.
  *
  * Determinism (the whole point of doing this in the engine rather
  * than a dataloader): span starts and lengths come from the repo's
  * mirrorable LCG — seed = (doc_id·1000003 + pos) mod 1e9+7 (pre-mod
  * keeps every product inside BIGINT on BOTH engines; DuckDB raises on
  * overflow where Spark wraps), u = LCG(seed) mod 1e6, a position
  * starts a span iff u < 50 000 (5 %), length 2 + u mod 3 ∈ {2,3,4} —
  * ≈15 % masked at mean length 3, the paper's defaults. Overlapping or
  * touching spans merge via the q107/q108 gaps-and-islands window;
  * sentinel numbers are the per-doc island rank. Re-running the corpus
  * reproduces every example bit-for-bit, so checkpointed training can
  * re-derive its data.
  *
  * Scale shape: the token stream shuffles once as (doc_id, pos) longs
  * for the islands window (only MASKED positions reach it — ~15 % of
  * tokens); the rewrite joins the bounded per-doc span list back to
  * the parsed doc and rebuilds input/target with index lambdas over
  * the intact words array (q102/q108's pattern), so text crosses
  * exactly the one rewrite-join exchange.
  *
  * No reference counterpart (SURVEY §2.8 extension, X64).
  */
object SpanCorruption {

  private val StartThreshold = 50000L // of 1e6: 5 % of positions

  private def sentinel(k: Column): Column =
    concat(lit("<extra_id_"), k.cast("string"), lit(">"))

  /** Per-document corruption example: (doc_id, input_text, target_text,
    * n_tokens, n_masked, n_spans). Span-free docs pass through with an
    * empty target.
    */
  def corrupt(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val parsed = docs.select(col(id).as("doc_id"),
      split(normalize(col(text)), " ").as("words"))

    val toks = parsed.select(col("doc_id"),
      size(col("words")).cast("long").as("n"),
      posexplode(col("words")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("n"), col("pos").cast("long").as("pos"))

    val seed = pmod(col("doc_id") * 1000003L + col("pos"), lit(1000000007L))
    val u = pmod(seed * 1103515245L + 12345L, lit(1000000L))
    val starts = toks
      .withColumn("u", u)
      .filter(col("u") < StartThreshold)
      .select(col("doc_id"), col("pos").as("st"),
        least(col("pos") + lit(1L) + pmod(col("u"), lit(3L)),
          col("n") - 1L).as("en"))

    val maskPos = starts
      .select(col("doc_id"), explode(sequence(col("st"), col("en"))).as("p"))
      .distinct()
    val byP = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val isl = maskPos
      .withColumn("brk",
        when(col("p") - lag(col("p"), 1).over(byP) > 1L, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        byP.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("st"), max(col("p")).as("en"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("st"))) - 1)

    val spansPerDoc = isl.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
        struct(col("st"), col("en"), col("k")))).as("spans"))

    parsed
      .join(spansPerDoc, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast("array<struct<st:bigint,en:bigint,k:int>>")))
      .withColumn("masked_idx",
        flatten(transform(col("spans"), s => sequence(s("st"), s("en")))))
      .withColumn("start_map", map_from_arrays(
        transform(col("spans"), s => s("st")),
        transform(col("spans"), s => s("k"))))
      .select(col("doc_id"),
        array_join(filter(
          transform(sequence(lit(0L), size(col("words")).cast("long") - 1L),
            i => when(element_at(col("start_map"), i).isNotNull,
              sentinel(element_at(col("start_map"), i)))
              .when(array_contains(col("masked_idx"), i),
                lit(null).cast("string"))
              .otherwise(element_at(col("words"), (i + 1L).cast("int")))),
          x => x.isNotNull), " ").as("input_text"),
        array_join(transform(col("spans"),
          s => array_join(concat(array(sentinel(s("k"))),
            slice(col("words"), (s("st") + 1L).cast("int"),
              (s("en") - s("st") + 1L).cast("int"))), " ")), " ")
          .as("target_text"),
        size(col("words")).cast("long").as("n_tokens"),
        size(col("masked_idx")).cast("long").as("n_masked"),
        size(col("spans")).cast("long").as("n_spans"))
      .orderBy(col("doc_id"))
  }
}
