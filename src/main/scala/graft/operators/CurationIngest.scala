package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.MockScorers.normalize

/** STREAMING curation — the q87 batch funnel's crawl-time counterpart:
  * each arriving micro-batch is quality-gated, PII-redacted, then
  * near-dup-ingested against the persistent corpus index
  * ([[IncrementalDedup.ingestBatch]], X25), so the kept store is
  * curated BY CONSTRUCTION — no nightly re-scrub of data that should
  * never have landed.
  *
  * Stage order is the scale argument: the gate and redaction are
  * map-only projections on the (small) arriving batch — rows drop at
  * the cheapest possible point, before any shingle/signature work or
  * index probe — and redaction precedes indexing so PII reaches
  * neither the kept store nor the index's shingle space (a later
  * redaction would also invalidate the stored signatures). The
  * downstream cost inherits X25's contract: per-batch work ∝ batch
  * size, the corpus index is probed exchange-free and appended, and
  * replays are self-healing.
  */
object CurationIngest {

  /** Map-only batch preparation: quality gate (q48's formula — ONE
    * definition via [[TextFeatures]]) then PII redaction (q70's
    * regexes — ONE definition via [[Pii]]). Expects (doc_id, text).
    */
  def prepare(batch: DataFrame, minQuality: Double = 0.3): DataFrame =
    batch
      .withColumn("norm", normalize(col("text")))
      .withColumn("n_words", size(split(col("norm"), " ")))
      .withColumn("punct_ratio",
        round(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))
          .cast("double") / length(col("text")), 4))
      .withColumn("quality",
        TextFeatures.quality(col("n_words"), col("punct_ratio")))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"), Pii.redact(col("text")).as("text"))

  /** `foreachBatch` body: prepare, then near-dup ingest (intra-batch
    * self-dedup on — near-dups arriving together collapse to their
    * minimum doc_id before touching the index). `packed = true` selects
    * the X67 b-bit probe prefilter (the index-side candidate read drops
    * from 32 signature longs to ONE packed word per doc — the r9 batch
    * win, now reachable from the crawl-shaped streaming loop too; same
    * mined pairs by [[IncrementalDedup.probeStaged]]'s packed-mode
    * contract since the packed word only PREfilters, exact signature
    * agreement still decides).
    */
  def step(batch: DataFrame, table: String, indexPath: String,
      keptDir: String, threshold: Double = 0.5, buckets: Int = 32,
      minQuality: Double = 0.3, packed: Boolean = false): Unit =
    IncrementalDedup.ingestBatch(prepare(batch, minQuality), table,
      indexPath, keptDir, threshold, buckets, selfDedup = true,
      packed = packed)

  /** Wire a (doc_id, text) stream into the curation loop. One
    * checkpoint location across restarts → each run processes exactly
    * the uncommitted offsets; kept-store/index idempotence under
    * replays is [[IncrementalDedup.ingestBatch]]'s contract.
    */
  def stream(input: DataFrame, table: String, indexPath: String,
      keptDir: String, checkpointDir: String, threshold: Double = 0.5,
      buckets: Int = 32, minQuality: Double = 0.3,
      trigger: Trigger = Trigger.AvailableNow(),
      packed: Boolean = false): StreamingQuery =
    input.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        step(batch, table, indexPath, keptDir, threshold, buckets,
          minQuality, packed)
      }
      .start()
}
