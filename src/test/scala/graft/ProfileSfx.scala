package graft

import org.apache.spark.sql.functions._

/** sf1-decade scaling spot-check (r6 verdict stretch item 8): build a
  * 10× documents corpus from sf0.1 (replica r prefixes every word with
  * `r<r>`, so WITHIN-replica dup/cluster structure is preserved exactly
  * while no cross-replica near-dups are invented — pair and cluster
  * counts scale ×10, matching a genuine corpus decade), then time the
  * most expensive suite queries and print observed t(10×)/t(1×)
  * ratios for SCALE.md's measured table. Not part of the library.
  *
  * Run: sbt "Test/runMain graft.ProfileSfx"
  */
object ProfileSfx {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val dst = s"${sys.props("java.io.tmpdir")}/graft-sfx1"
    // SPARK_GRAFT_SFX_REUSE=1 skips the corpus rebuild (it is
    // deterministic, so a previous run's output is identical);
    // SPARK_GRAFT_ONLY=q104,q105 probes a subset — both so a partial
    // run can be completed without repaying the full ~10 min
    val reuse = sys.env.get("SPARK_GRAFT_SFX_REUSE").contains("1") &&
      new java.io.File(s"$dst/documents.parquet/_SUCCESS").exists()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)

    val offset = 10000000L
    if (!reuse) {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val replicas = (0 until 10).map { r =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(r * offset))
      if (r == 0) d
      else d.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", s"r$r$$1"))
    }
    replicas.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    }
    val n = spark.read.parquet(s"$dst/documents.parquet").count()
    println(s"[prof] sfx1 documents rows = $n (10x sf0.1)")

    // embeddings ×10: replica r cyclically shifts coordinates by r·7 —
    // norms and every WITHIN-replica cosine are preserved exactly (the
    // dup/cluster structure scales ×10) while cross-replica cosines
    // scramble to generic values; any that land over a probe threshold
    // only ADD pairs, which is the conservative direction for a cost
    // probe
    if (!reuse) {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = 64
    // 100k id stride (not the documents' 10M): q100 requires max
    // vec_id < 1,000,000 (its planted-pair band starts there — the
    // guard is deliberately a band check, not a collision join);
    // 10 replicas × 2k ids top out at ~902k, inside the band
    val embOffset = 100000L
    val embReplicas = (0 until 10).map { r =>
      val s = (r * 7) % dim
      val e = emb.withColumn("vec_id", col("vec_id") + lit(r * embOffset))
      if (r == 0) e
      else e.withColumn("embedding",
        concat(slice(col("embedding"), s + 1, dim - s),
          slice(col("embedding"), 1, s)))
    }
    embReplicas.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    }
    println(s"[prof] sfx1 embeddings rows = " +
      spark.read.parquet(s"$dst/embeddings.parquet").count())

    val probed = Seq(
      graft.operators.DedupQueries.q68,
      graft.operators.DedupQueries.q81,
      graft.operators.TrainPrepQueries.q87,
      graft.operators.TrainPrepQueries.q96,
      graft.operators.SketchQueries.q72a,
      // r7 additions
      graft.operators.TrainPrepQueries.q101,
      graft.operators.DedupQueries.q102,
      graft.operators.SimilarityQueries.q100,
      // r8: winnowing — the word-prefix replica transform preserves
      // WITHIN-replica gram equality (every word shifts uniformly), so
      // fp/dup structure scales ×10 with no cross-replica dups invented
      graft.operators.DedupQueries.q104,
      graft.operators.DedupQueries.q105,
      // r8: exact-substring dedup — the density-1 gram stream is the
      // probe's heaviest per-token shuffle; the replica transform's
      // uniform word-prefix shift keeps gram equality within replicas,
      // so duplicated-span structure scales ×10 like the corpus
      graft.operators.DedupQueries.q107,
      graft.operators.DedupQueries.q108,
      // r8: perplexity buckets — q83's shuffles + the lang window
      graft.operators.TextQueries.q106,
      // r8: hashed classifier (token-linear, q49's shuffle shape) and
      // D4 diversification (one cell window over the replica vectors)
      graft.operators.TextQueries.q111,
      graft.operators.SimilarityQueries.q112,
      // r8: span corruption — token-linear LCG masking, islands window
      // over only the ~15 % masked positions, ONE text rewrite join
      graft.operators.TrainPrepQueries.q113,
      // r9: the composed near-dup funnel (exact dedup → dispatched pair
      // join → report; the word-prefix replica keeps fingerprint/pair
      // structure scaling ×10), cluster-keyed splitting (pairs +
      // closure + id hash), and lift collocations (adjacent-pair +
      // unigram count frames, both vocab-sublinear)
      graft.operators.DedupQueries.q115,
      graft.operators.DedupQueries.q117,
      graft.operators.TextQueries.q122,
      // r10 (VERDICT r9 item 5): the two decade claims that matter most
      // at 100 TB — q110's prefix-filtered PPJoin and q116's
      // cell-bounded learned SemDeDup — plus q40's digest hash-agg and
      // q42's brute-Jaccard baseline (the Σdf² face kept behind the
      // cost dispatch; its exponent DOCUMENTS why the dispatch exists)
      graft.operators.DedupQueries.q40,
      graft.operators.DedupQueries.q42,
      graft.operators.DedupQueries.q110,
      graft.operators.SimilarityQueries.q116,
      // r11 additions: BM25 (token-linear, two tiny agg frames), char
      // entropy (alphabet-bounded count arrays), cross-corpus decontam
      // (the Σ df_train·df_eval face — the replica transform keeps the
      // train/eval split and the within-replica overlap structure)
      graft.operators.Bm25.q133,
      graft.operators.CharEntropy.q134,
      graft.operators.CrossDecontam.q135,
      // r12 additions: Hellinger vocab drift (the sorted-fold array is
      // the SHARED vocab — Heaps-sublinear is the claim to certify)
      // and incremental CC (certificate-merge closure over the sliced
      // brute pair set — the Σdf² pair face plus 4 star-forest merges)
      graft.operators.VocabDrift.q151,
      graft.operators.IncrementalCc.q154,
      graft.operators.Bm25.q157,
      graft.operators.KappaAgreement.q155,
      graft.operators.GiniConcentration.q152,
      graft.operators.RankingMetrics.q158,
      // r15: RRF fusion — one doc scan + three |docs|-frame ranks;
      // schema-evolution merged read (two batch writes + one scan)
      graft.operators.RankFusion.q174,
      graft.operators.SchemaEvolution.q182,
      // r16: priority sampling (scan-local priorities + partial top-k
      // heaps — the honest expectation is scan-bound), compaction
      // planning (one manifest prefix window + bin groupBy), shard
      // rebalance (pure map-side CASE tree + two 1-row aggregates)
      graft.operators.PrioritySample.q186,
      graft.operators.CompactionPlanner.q194,
      graft.operators.ShardRebalance.q197,
      // r16 fourth batch: exact KS over the (source, length) dimension
      // frame — one corpus scan, per-pair range windows on that frame
      graft.operators.KsDrift.q205,
      // r16 fifth batch: vocab saturation (token census → |vocab|
      // frame + k-row curve — the X44/X68 exchange shape), decile
      // lift (q111's token exchange + |docs| NTILE window)
      graft.operators.VocabSaturation.q210,
      graft.operators.DecileLift.q219,
      graft.operators.EmdDrift.q232,
      // repetition audit: per-doc gram arrays + one (doc, gram) census
      graft.operators.RepetitionAudit.q220,
      // r17: burstiness (one (token, doc) map-side pass + TakeOrdered
      // head), aspect co-mention (q22's melt + a ≤28-pairs-per-doc join)
      graft.operators.TokenBurstiness.q239,
      graft.operators.AspectComention.q240,
      // X211: the q21 melt + |aspects × buckets| MK frames
      graft.operators.AspectDrift.q244,
      // r18 batch: all four reduce to dimension frames after one
      // map-side pass — McNemar to a 1-row cell census, JSD to
      // |sources × langs|, Chao1/diversity to per-group
      // count-of-counts (the |group × vocab| groupBy is the cost)
      graft.operators.McNemar.q249,
      graft.operators.JsDivergence.q251,
      graft.operators.Chao1Richness.q253,
      graft.operators.DiversityIndex.q254,
      // r19 batch: the gate battery (q258/q259 — 1-row cell censuses
      // after one scan), Hellinger (the q253 |source × vocab| census
      // + one |vocab| join), capture-recapture (one fingerprint
      // groupBy — the q40 exchange), Kendall's W (the q174 rank
      // machinery + a 1-row decimal fold)
      graft.operators.CochranQ.q258,
      graft.operators.FleissKappa.q259,
      graft.operators.HellingerDrift.q262,
      graft.operators.CaptureRecapture.q263,
      graft.operators.KendallW.q267,
      // r19 late batch: keyness/Cronbach/Wilson are one tokenize/
      // feature scan to a census (keyness re-aggs the census for
      // margins — never a second corpus pass)
      graft.operators.DunningKeyness.q277,
      graft.operators.CronbachAlpha.q279,
      graft.operators.WilsonInterval.q281)

    def minOf(reps: Int)(f: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    probed.filter(q => only.forall(names =>
      names.exists(q.name.startsWith))).foreach { q =>
      val t01 = minOf(2)(q.build(spark, src).count())
      val t1 = minOf(2)(q.build(spark, dst).count())
      println(f"[prof] ${q.name}: sf0.1 $t01%.2f s -> sfx1 $t1%.2f s " +
        f"(ratio ${t1 / t01}%.1fx, exponent ${math.log10(t1 / t01)}%.2f)")
    }

    // SemDeDup probed at its CONTRACT (scaladoc: size `cells` ∝ corpus,
    // the paper's ~100k clusters for LAION — constant per-cell
    // occupancy keeps the |cell|² face per vector constant): 8 cells at
    // 1×, 80 at 10×. q100 above holds cells=8 FIXED for oracle
    // tractability, so its 10× ratio is the measured cost of VIOLATING
    // the contract (the per-cell face grows 100×), not the operator's
    // scale behavior.
    if (only.forall(_.exists(n => "semdedup_cells".startsWith(n)))) {
      val dim = 64
      def planes(k: Int) = Array.tabulate(k * dim)(x =>
        (((x * 1103515245L + 12345L) % 2001L) - 1000L) / 1000.0)
      val times = Seq((src, 8), (dst, 80)).map { case (dir, cells) =>
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val t = minOf(2)(graft.operators.SemanticDedup.prune(
          emb, planes(cells), cells, dim, minCos = 0.5).count())
        println(f"[prof] semdedup_cells cells=$cells ($dir): $t%.2f s")
        t
      }
      println(f"[prof] semdedup_cells contract ratio ${times(1) / times(0)}%.1fx " +
        f"(exponent ${math.log10(times(1) / times(0))}%.2f)")
    }
    ProfileCleanup(dst)
    spark.stop()
  }
}
