package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership pre-filter for incremental dedup — the cheap
  * gate IN FRONT of the exact machinery. [[IncrementalDedup]]'s bucketed
  * index answers "which corpus doc does this near-match?"; most ingest
  * rows don't near-match anything, and at 100 TB the cheapest possible
  * "definitely new" answer is a bloom filter: ~1.2 bytes per indexed
  * item at 1% FPP, no join, no shuffle, evaluated inside whole-stage
  * codegen on the scan. False positives route a small excess to the
  * exact verify (which rejects them); false negatives are impossible,
  * so the gate never loses a duplicate.
  *
  * Build uses Spark's public sketch aggregation
  * (`DataFrameStatFunctions.bloomFilter` → `util.sketch.BloomFilter`,
  * merged per-partition, driver-held like any broadcast sketch — size
  * is a function of capacity/FPP, NOT corpus bytes); probe embeds the
  * serialized sketch as a binary literal under Catalyst's own
  * `BloomFilterMightContain` (the expression behind AQE runtime
  * filters), which deserializes once per task and codegens the probe.
  */
object BloomDedup {

  /** Build a serialized bloom filter over `fps`'s LongType column
    * `fpCol`. `expectedItems` sizes the sketch: insertions beyond it
    * degrade FPP, never correctness.
    */
  def build(fps: DataFrame, fpCol: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val bf = fps.stat.bloomFilter(fpCol, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Probe column: true when `value` (LongType fingerprint) might be in
    * `bloom`; false means definitely absent.
    */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), Bridge.expression(value)))
}
