package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Compressibility as a corpus-quality signal (X18 family): the deflate
  * ratio of a document's text. Boilerplate, template spam, and
  * repetition compress far below natural prose, so pipelines cut both
  * tails (near-zero ratio = machine-generated repetition; ratio ≈ 1 =
  * high-entropy noise/binary junk) — the zlib-ratio filter used
  * alongside the Gopher repetition rules (q69's explicit counters; this
  * is the catch-all the counters miss).
  *
  * Scale shape: pure per-row map — NO shuffle and no join; the ratio
  * rides along as appended columns in the same pass — with the native
  * zlib context allocated ONCE per partition (`mapPartitions`) and
  * reset per row, the same amortization discipline as
  * [[Multimodal.extractFeatures]]. The ratio is deterministic: fixed
  * deflate level over fixed bytes.
  *
  * No SQL oracle (DuckDB has no zlib surface); invariants are pinned in
  * CompressibilitySpec (determinism, bounds, repetition ordering).
  */
object Compressibility {

  final case class DocRatio(doc_id: Long, n_raw: Int, n_comp: Int,
      ratio: Double)

  /** Deflate level 6 (zlib default): the standard corpus-filter setting;
    * ratios shift with level, so it is fixed here, not a parameter.
    */
  private val Level = 6

  private def measure(deflater: java.util.zip.Deflater, buf: Array[Byte],
      text: String): (Int, Int, Double) = {
    val raw = Option(text).getOrElse("").getBytes("UTF-8")
    deflater.reset()
    deflater.setInput(raw)
    deflater.finish()
    var n = 0
    while (!deflater.finished()) n += deflater.deflate(buf)
    val ratio =
      if (raw.isEmpty) 1.0
      else math.rint(n.toDouble / raw.length * 10000) / 10000
    (raw.length, n, ratio)
  }

  /** All input columns preserved, plus (n_raw, n_comp, ratio) — one map
    * pass, no join.
    */
  def withRatio(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val outSchema = docs.schema
      .add("n_raw", IntegerType).add("n_comp", IntegerType)
      .add("ratio", DoubleType)
    val textIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions({ rows =>
      // one native zlib context per partition, reset per row; its
      // native memory is released by the finalizer after the task
      val deflater = new java.util.zip.Deflater(Level, false)
      val buf = new Array[Byte](64 * 1024)
      rows.map { r =>
        val (nRaw, nComp, ratio) = measure(deflater, buf,
          if (r.isNullAt(textIdx)) null else r.getString(textIdx))
        // Seq[Any], NOT Seq(...): a mixed Int/Double Seq would widen the
        // Ints to Double and break the row encoder's INT fields
        Row.fromSeq(r.toSeq ++ Seq[Any](nRaw, nComp, ratio))
      }
    })(Encoders.row(outSchema))
  }

  /** Typed per-doc result (the q79 shape). */
  def ratios(docs: DataFrame, textCol: String = "text"): Dataset[DocRatio] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(docs.col("doc_id"), docs.col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(Level, false)
        val buf = new Array[Byte](64 * 1024)
        rows.map { case (id, text) =>
          val (nRaw, nComp, ratio) = measure(deflater, buf, text)
          DocRatio(id, nRaw, nComp, ratio)
        }
      }
  }

  /** The both-tails quality gate: keep docs whose ratio is inside
    * (minRatio, maxRatio) — cut repetition below, entropy junk above.
    * Same single-pass plan as [[withRatio]].
    */
  def gate(docs: DataFrame, minRatio: Double = 0.2,
      maxRatio: Double = 0.9, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.col
    withRatio(docs, textCol)
      .filter(col("ratio") > minRatio && col("ratio") < maxRatio)
      .drop("n_raw", "n_comp", "ratio")
  }
}
