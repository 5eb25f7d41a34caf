package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * storage/scan lever for similarity search at 100 TB: a 64-dim float64
  * vector is 512 B; its int8 form + one float scale is ~68 B (7.5×).
  * The coarse pass (candidate generation, distance prefilter) reads the
  * int8 column; exact rerank reads full precision only for the
  * candidate set — the standard two-stage ANN read pattern.
  *
  * Pure Column expressions (codegen'd higher-order functions, no UDF):
  * scale = max|x| / 127, q = round(x / scale) per component. Dequantized
  * error is ≤ scale/2 per component (asserted in QuantizeSpec via cosine
  * fidelity of the round trip).
  */
object Quantize {

  /** Per-vector quantization scale: max|x| / 127. Compute this ONCE
    * into its own column and pass it to [[quantizeWith]] — referencing
    * the aggregate fold inside the component lambda would re-run the
    * O(d) fold per element (O(d²) per row).
    */
  def scaleOf(emb: Column): Column =
    aggregate(emb, lit(0.0d), (acc, x) => greatest(acc, abs(x))) /
      lit(127.0d)

  /** array<double> + pre-bound scale column →
    * struct(scale double, q array<tinyint>). Zero vectors quantize to
    * scale 0 and all-zero components.
    */
  def quantizeWith(emb: Column, scale: Column): Column =
    struct(
      scale.as("scale"),
      when(scale === 0d,
        transform(emb, _ => lit(0).cast("tinyint")))
        .otherwise(transform(emb, x => round(x / scale).cast("tinyint")))
        .as("q"))

  /** Convenience one-expression form. NOTE: embeds the scale fold in
    * the lambda, so it evaluates O(d²) per row — fine for small d or
    * one-off checks; hot paths should bind [[scaleOf]] to a column
    * first and call [[quantizeWith]].
    */
  def quantize(emb: Column): Column = quantizeWith(emb, scaleOf(emb))

  /** struct(scale, q) → array<double> approximation of the original. */
  def dequantize(qs: Column): Column =
    transform(qs.getField("q"),
      v => v.cast("double") * qs.getField("scale"))

  /** Approximate dot product directly on two quantized structs: the
    * EXACT integer int8 dot (native
    * [[graft.functions.expressions.TinyDot]] loop — no higher-order
    * transform in the coarse-pass hot path) scaled by both scales.
    * Reads 16× fewer bytes than a float64 dot.
    */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.expressions.VectorFunctions
      .tinyDot(a.getField("q"), b.getField("q")).cast("double") *
      a.getField("scale") * b.getField("scale")
}
