package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import MinHashDedup._
import graft.Checkpoints.EagerCheckpoint

/** Incremental near-dup detection: dedupe a NEW batch of documents
  * against an already-indexed corpus without recomputing anything on the
  * corpus side — the crawl-ingest shape of a training-data pipeline,
  * where the corpus is ~100 TB and each incoming batch is a sliver of it.
  * (The reference has no dedup at all; SURVEY §2.8 X15 extension, same
  * family as [[MinHashDedup]].)
  *
  * Index layout (the scale decision, cf. [[graft.sources.Warehouse]]):
  *   - `<table>_buckets` (doc_id, bkey): one row per (doc, band), stored
  *     BUCKETED BY bkey — the probe's band join runs with no exchange on
  *     the corpus side, so per-batch cost is ∝ batch size + matched
  *     buckets, never ∝ corpus size.
  *   - `<table>_sigs` (doc_id, sig, n_sh): the 32-int signature +
  *     shingle count per corpus doc, bucketed by doc_id, joined only to
  *     surviving candidates.
  *
  * Exact verification re-reads corpus TEXT only for candidate docs (an
  * IN-pushdown / semi-join-pruned scan): the index never stores shingle
  * sets, which would rival the corpus itself in size.
  */
object IncrementalDedup {

  /** Signature + shingle-count frame for `docs` (sig as array<int>),
    * plus the X67 b-bit packed word `bsig`: ONE extra long per doc in
    * the index so a probe can choose the packed prefilter and — via
    * plain parquet column pruning — read 1/32 of the signature bytes
    * (the `sig` column is never scanned in packed mode).
    */
  private def sigFrame(sh: DataFrame, sigTable: DataFrame): DataFrame =
    sigTable
      .withColumn("sig",
        array((0 until NumHashes).map(i => col(s"sig_$i").cast("int")): _*))
      .select(col("doc_id"), col("sig"))
      .join(BbitMinHash.pack(sigTable), "doc_id")
      .join(sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh")),
        "doc_id")
      .select(col("doc_id"), col("sig"), col("bsig"), col("n_sh"))

  /** Write both index tables from already-computed shingle/signature
    * frames — the single write path behind [[writeIndex]],
    * [[appendToIndex]] and [[ingestBatch]] (which reuses the probe's
    * materialized signatures instead of recomputing them).
    */
  private def writeTables(sh: DataFrame, sigTable: DataFrame,
      table: String, path: String, buckets: Int, mode: String): Unit = {
    sigFrame(sh, sigTable).write.mode(mode)
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .option("path", s"$path/sigs").format("parquet")
      .saveAsTable(s"${table}_sigs")
    bandBuckets(sigTable).write.mode(mode)
      .bucketBy(buckets, "bkey").sortBy("bkey")
      .option("path", s"$path/buckets").format("parquet")
      .saveAsTable(s"${table}_buckets")
  }

  /** Build (or rebuild) the corpus index as two bucketed tables rooted at
    * `path`. One corpus scan; signatures are computed once, here, and
    * never again for this corpus.
    */
  def writeIndex(corpusDocs: DataFrame, table: String, path: String,
      buckets: Int = 32, textCol: String = "text"): Unit = {
    val sh = shingles(corpusDocs, textCol).eagerCheckpoint()
    val sigTable = signatures(sh).eagerCheckpoint()
    writeTables(sh, sigTable, table, path, buckets, "overwrite")
  }

  /** Append newly-ingested (already deduped) docs to the index — the
    * steady-state ingest step: index the batch that survived [[probe]]
    * so the NEXT batch dedupes against it too. Bucketed append (same
    * spec), no rewrite of existing files.
    */
  def appendToIndex(newDocs: DataFrame, table: String, path: String,
      buckets: Int = 32, textCol: String = "text"): Unit = {
    val sh = shingles(newDocs, textCol).eagerCheckpoint()
    val sigTable = signatures(sh).eagerCheckpoint()
    writeTables(sh, sigTable, table, path, buckets, "append")
  }

  /** Re-register the index tables from their on-disk data when this
    * session's catalog does not know them — a NEW Spark application
    * (restart) starts with an empty in-memory catalog while the index
    * lives on in `path`. Without this, the first post-restart batch
    * would both skip dedup entirely AND `writeIndex`-overwrite the
    * accumulated index with itself. Returns true iff a usable index is
    * registered after the call.
    */
  private[operators] def ensureRegistered(spark: SparkSession,
      table: String, path: String, buckets: Int): Boolean = {
    if (spark.catalog.tableExists(s"${table}_sigs") &&
      spark.catalog.tableExists(s"${table}_buckets")) return true
    val bucketsPath = new org.apache.hadoop.fs.Path(s"$path/buckets")
    val fs = bucketsPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.exists(bucketsPath) &&
      graft.streaming.AbsaPipeline.hasCommittedData(fs, bucketsPath)
    if (!onDisk) return false
    spark.sql(s"""
      CREATE TABLE IF NOT EXISTS ${table}_sigs
        (doc_id BIGINT, sig ARRAY<INT>, bsig BIGINT, n_sh BIGINT)
      USING parquet
      CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO $buckets BUCKETS
      LOCATION '$path/sigs'""")
    spark.sql(s"""
      CREATE TABLE IF NOT EXISTS ${table}_buckets
        (doc_id BIGINT, bkey BIGINT)
      USING parquet
      CLUSTERED BY (bkey) SORTED BY (bkey) INTO $buckets BUCKETS
      LOCATION '$path/buckets'""")
    true
  }

  /** The LAZY candidate frame of [[probe]]'s band-join + prefilter stage
    * (batch_doc, corpus_doc) — factored out so the plan shape (bucketed
    * index scan, no corpus-side exchange) is assertable before [[probe]]
    * eagerly materializes it.
    */
  private[operators] def candidates(shB: DataFrame, sigTableB: DataFrame,
      table: String, threshold: Double,
      packed: Boolean = false): DataFrame = {
    val spark = shB.sparkSession
    val sigsB = sigFrame(shB, sigTableB)
    val idxBuckets = spark.table(s"${table}_buckets")
      .select(col("doc_id").as("corpus_doc"), col("bkey"))
    val candRaw = bandBuckets(sigTableB)
      .select(col("doc_id").as("batch_doc"), col("bkey"))
      .join(idxBuckets, "bkey")
      .select(col("batch_doc"), col("corpus_doc"))
    val idxSigs = spark.table(s"${table}_sigs")
    // packed mode (X67 → X25, VERDICT r9 item 4): the prefilter compares
    // ONE 64-bit word per side with the Li–König corrected estimate, so
    // column pruning drops the 32-int `sig` column from the index scan —
    // the probe reads ~1/32 of the signature bytes. Same -0.25 margin;
    // the estimator is noisier (2-bit lanes collide), but the downstream
    // EXACT text verify keeps precision identical — only borderline-
    // candidate recall can differ, measured in SketchSpec's A/B.
    val prefiltered =
      if (packed)
        candRaw
          .join(sigsB.select(col("doc_id").as("batch_doc"),
            col("bsig").as("bsig_a"), col("n_sh").as("n_a")), "batch_doc")
          .join(idxSigs.select(col("doc_id").as("corpus_doc"),
            col("bsig").as("bsig_b"), col("n_sh").as("n_b")), "corpus_doc")
          .filter(greatest(col("n_a"), col("n_b")) * threshold <=
            least(col("n_a"), col("n_b")))
          .filter(BbitMinHash.estimate(col("bsig_a"), col("bsig_b")) >=
            threshold - 0.25)
      else
        candRaw
          .join(sigsB.select(col("doc_id").as("batch_doc"),
            col("sig").as("sig_a"), col("n_sh").as("n_a")), "batch_doc")
          .join(idxSigs.select(col("doc_id").as("corpus_doc"),
            col("sig").as("sig_b"), col("n_sh").as("n_b")), "corpus_doc")
          // J ≥ t bounds set sizes within factor 1/t (cf. candidateStage)
          .filter(greatest(col("n_a"), col("n_b")) * threshold <=
            least(col("n_a"), col("n_b")))
          .withColumn("est",
            size(filter(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => x === y), m => m)).cast("double") / NumHashes)
          .filter(col("est") >= threshold - 0.25)
    prefiltered
      .select(col("batch_doc"), col("corpus_doc"))
      .distinct()
  }

  /** [[probe]] plus the batch's materialized shingle/signature frames,
    * so [[ingestBatch]] can index the survivors WITHOUT recomputing the
    * per-doc pipeline (normalize → 3-gram explode → 32 permutations) a
    * second time — the most expensive per-doc work in the loop.
    */
  private[operators] def probeStaged(batchDocs: DataFrame,
      corpusDocs: DataFrame, table: String, threshold: Double,
      textCol: String, packed: Boolean = false)
      : (DataFrame, DataFrame, DataFrame) = {
    val shB = shingles(batchDocs, textCol).eagerCheckpoint()
    val sigTableB = signatures(shB).eagerCheckpoint()
    val cand = candidates(shB, sigTableB, table, threshold, packed)
      .eagerCheckpoint() // reused by the id-pushdown AND the verify

    val setsB = shB.groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("shset"))
    // A semi join prunes ROWS but still reads every corpus file. The
    // candidate id set is usually tiny relative to the corpus (it is
    // bounded by batch size × near-dup rate), so when it fits a driver
    // list, push it down as an IN filter instead — parquet min/max
    // stats then SKIP non-matching row groups and the verify scan cost
    // tracks the batch, not the corpus. Above the gate (a pathological
    // all-dup batch), fall back to the semi join.
    val candIds = cand.select(col("corpus_doc")).distinct()
    val candCorpus = {
      val ids = candIds.limit(graft.Limits.InListRows.toInt + 1)
        .collect().map(_.getLong(0))
      if (ids.length <= graft.Limits.InListRows)
        corpusDocs.filter(col("doc_id")
        .isin(scala.collection.immutable.ArraySeq.unsafeWrapArray(ids): _*))
      else corpusDocs.join(candIds.withColumnRenamed("corpus_doc", "doc_id"),
        Seq("doc_id"), "left_semi")
    }
    val setsC = shingles(candCorpus, textCol).groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("shset"))
    val pairs = cand
      .join(setsB.select(col("doc_id").as("batch_doc"),
        col("shset").as("set_a")), "batch_doc")
      .join(setsC.select(col("doc_id").as("corpus_doc"),
        col("shset").as("set_b")), "corpus_doc")
      .withColumn("n_inter",
        size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("n_inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_doc"), col("corpus_doc"), col("jaccard"))
      .orderBy(col("batch_doc"), col("corpus_doc"))
    (pairs, shB, sigTableB)
  }

  /** Near-dup (batch_doc, corpus_doc, jaccard) pairs of `batchDocs`
    * against the index `table`, at Jaccard ≥ `threshold`. Same candidate
    * discipline as [[MinHashDedup.nearDuplicates]]: band join →
    * size-ratio cut → signature-estimate prefilter → exact verify; plus
    * the incremental property that no corpus signature is recomputed.
    *
    * `corpusDocs` supplies the text for exact verification only; the
    * scan is pruned to candidate docs (IN pushdown / semi join).
    *
    * `packed = true` selects the X67 b-bit prefilter: the index-side
    * signature read shrinks to one long per doc (column pruning), at
    * the cost of a noisier estimate before the unchanged exact verify.
    */
  def probe(batchDocs: DataFrame, corpusDocs: DataFrame, table: String,
      threshold: Double, textCol: String = "text",
      packed: Boolean = false): DataFrame =
    probeStaged(batchDocs, corpusDocs, table, threshold, textCol,
      packed)._1

  /** Streamed-ingest step (a `foreachBatch` body): drop every batch doc
    * that near-duplicates the already-kept corpus, append the survivors
    * to both the kept-docs store and the index. Cross-batch dedup by
    * default; `selfDedup = true` adds a [[MinHashDedup]] pass so
    * near-dups arriving WITHIN one micro-batch collapse to their
    * minimum doc_id before touching the index.
    *
    * Replay-tolerant under at-least-once delivery: a re-delivered doc is
    * dropped by the exact doc_id anti-join against the kept store — run
    * whenever the kept store has data, even when the index is missing or
    * unregistered, so a crash before the very first index write cannot
    * duplicate the first batch — and, failing that, by matching itself
    * in the index at Jaccard 1.0. After an application restart the index
    * tables are re-registered from disk ([[ensureRegistered]]) instead
    * of being clobbered by a fresh overwrite.
    *
    * Crash ordering: the kept store is written BEFORE the index. The two
    * writes are not atomic; a crash between them leaves one batch's docs
    * kept but unindexed — a bounded recall loss (future near-dups of
    * those docs slip through). The reverse order would instead LOSE the
    * batch permanently on replay (indexed ⇒ self-matched ⇒ dropped,
    * but never kept). A transactional table format would close the gap;
    * with plain parquet, kept-first is the right degradation.
    */
  def ingestBatch(batch: DataFrame, table: String, indexPath: String,
      keptDir: String, threshold: Double, buckets: Int = 32,
      textCol: String = "text", selfDedup: Boolean = false,
      packed: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val keptPath = new org.apache.hadoop.fs.Path(keptDir)
    val fs = keptPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keptHasData = fs.exists(keptPath) &&
      graft.streaming.AbsaPipeline.hasCommittedData(fs, keptPath)
    val indexUsable =
      ensureRegistered(spark, table, indexPath, buckets) && keptHasData

    // optional intra-batch pass: near-dups ARRIVING TOGETHER never reach
    // the index (keep the min doc_id of each pair; dropping every doc_b
    // collapses chains to their minimum since pairs are a < b)
    val deduped =
      if (!selfDedup) batch
      else batch.join(
        MinHashDedup.nearDuplicates(batch, threshold, textCol)
          .select(col("doc_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    // exact replays: key-only pruned scan of the kept store — cheaper
    // than the signature probe, and the only protection when a crash
    // preceded the first index write
    // materialized once: every downstream consumer (kept rows, shingle/
    // signature frames, the probe) must see the SAME batch snapshot
    val fresh =
      (if (!keptHasData) deduped
      else deduped.join(
        spark.read.parquet(keptDir).select(col("doc_id")),
        Seq("doc_id"), "left_anti")).eagerCheckpoint()
    val (kept, shKept, sigKept) =
      if (!indexUsable) {
        val shF = shingles(fresh, textCol).eagerCheckpoint()
        (fresh, shF, signatures(shF).eagerCheckpoint())
      } else {
        val corpus = spark.read.parquet(keptDir)
        val (pairs, shF, sigTableF) =
          probeStaged(fresh, corpus, table, threshold, textCol, packed)
        val dups = pairs.select(col("batch_doc").as("doc_id")).distinct()
        // materialized: the survivor set feeds TWO writes below and must
        // not be recomputed differently between them
        val kept = fresh.join(dups, Seq("doc_id"), "left_anti")
          .eagerCheckpoint()
        val keptIds = kept.select(col("doc_id"))
        // reuse the probe's materialized per-doc work for the index
        // append — no second shingle/signature computation
        (kept,
          shF.join(keptIds, Seq("doc_id"), "left_semi"),
          sigTableF.join(keptIds, Seq("doc_id"), "left_semi"))
      }
    kept.write.mode("append").parquet(keptDir)
    writeTables(shKept, sigKept, table, indexPath, buckets,
      if (indexUsable) "append" else "overwrite")
  }
}
