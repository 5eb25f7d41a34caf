package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Checkpoints.EagerCheckpoint
import graft.functions.MockScorers.normalize

/** Approximate near-dup detection (north-star X15): MinHash + LSH banding
  * and SimHash. All hashing rides the md5-derived 60-bit lane hash
  * ([[KmvSketch.h60]] — identical in Spark and DuckDB), so the WHOLE
  * pipeline — signatures, band keys, candidate mining, verification —
  * replays as DuckDB SQL and q43/q44 are hash-exact against the driver
  * oracle (r17; the KMV q126 / Count-Min q211 precedent, VERDICT r16
  * item 4). The brute-force Jaccard specs in SketchSpec remain as the
  * semantic (recall) oracle.
  *
  * Scale design: the only shuffles are (a) shingle-rows → per-doc
  * signature aggregation and (b) the band-bucket self-join, whose fan-out
  * is bounded by band width; candidate verification joins back bounded
  * shingle-set arrays, never full text. At 100 TB this is the standard
  * shingle → signature → band → verify pipeline (MMDS ch. 3 shape).
  */
object MinHashDedup {

  val NumHashes = 32
  val Bands = 16 // 2 rows per band: P(candidate | s) = 1-(1-s^2)^16
  val RowsPerBand: Int = NumHashes / Bands
  private[operators] val P = 2147483647L // 2^31 - 1

  // fixed permutation constants, seeded for reproducibility; exposed to
  // the package so q43's DuckDB oracle can splice the SAME constants
  // into its SQL replay of the signature stage
  private[operators] val perms: Seq[(Long, Long)] = {
    val rnd = new java.util.Random(42)
    Seq.fill(NumHashes)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
  }

  /** doc_id + distinct 3-word shingles. */
  def shingles(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), split(normalize(col(textCol)), " ").as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(words) - 2), " +
            "i -> concat_ws(' ', words[i-1], words[i], words[i+1]))"))
          .as("shingle"))
      .distinct()

  /** doc_id + sig_0..sig_31 (min of permuted 31-bit shingle hashes).
    * Base hash = md5-60-bit mod P ([[KmvSketch.h60]]) — engine-neutral,
    * so the DuckDB oracle replays the signatures bit-exactly.
    */
  def signatures(sh: DataFrame): DataFrame = {
    val base = pmod(KmvSketch.h60(col("shingle")), lit(P))
    val hashed = perms.zipWithIndex.foldLeft(sh) {
      case (df, ((a, b), i)) =>
        df.withColumn(s"h_$i", pmod(lit(a) * base + lit(b), lit(P)))
    }
    hashed.groupBy(col("doc_id"))
      .agg(min(col("h_0")).as("sig_0"),
        (1 until NumHashes).map(i => min(col(s"h_$i")).as(s"sig_$i")): _*)
  }

  /** One row per (doc, band): `bkey` fuses (band id, band bucket) into a
    * single 64-bit join key, so band co-membership is a ONE-column
    * equi-join — which is also what lets [[IncrementalDedup]] store the
    * corpus side bucketed by `bkey` and probe it exchange-free. A 64-bit
    * collision between different (band, bucket) pairs only ADMITS a
    * candidate (verified exactly downstream), never loses one.
    */
  private[operators] def bandBuckets(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand)
        .map(r => col(s"sig_${b * RowsPerBand + r}").cast("string"))
      // md5-60-bit over "band:sig:sig" — same engine-neutral key in the
      // DuckDB oracle; a 60-bit collision between different (band,
      // bucket) pairs only ADMITS a candidate, never loses one
      KmvSketch.h60(concat_ws(":", lit(b.toString) +: rows: _*))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bkey"))
  }

  /** Band-bucket co-membership pairs, possibly with duplicates (one row
    * per shared band). Callers that need set semantics call
    * [[candidatePairs]]; the dedup pipeline filters FIRST and dedupes the
    * few survivors — a distinct here would shuffle millions of raw pairs.
    */
  private[operators] def bandPairs(sigs: DataFrame): DataFrame = {
    val banded = bandBuckets(sigs)
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
  }

  /** Candidate pairs: docs sharing any LSH band bucket. */
  def candidatePairs(sigs: DataFrame): DataFrame =
    bandPairs(sigs).distinct()

  /** Above this many docs the signature table (~150 B/doc: 32 ints +
    * doc_id + size) stops being a safe explicit broadcast (~150 MB at the
    * limit); an explicit hint is honored REGARDLESS of size, so at
    * billions of docs it would OOM the driver. Past the gate we leave the
    * join strategy to Catalyst/AQE (shuffle join on doc_id, co-partitioned
    * with the band-pair shuffle). Shared project-wide as
    * [[graft.Limits.BroadcastRows]].
    */
  val BroadcastDocLimit: Long = graft.Limits.BroadcastRows

  /** Band pairs → size-ratio cut → signature-estimate prefilter →
    * distinct. Factored out so the profiler can time it in isolation.
    * `hintBroadcast` gates the explicit broadcast of the signature table
    * (see [[BroadcastDocLimit]]).
    */
  private[graft] def candidateStage(sigTable: DataFrame, sigs: DataFrame,
      threshold: Double, hintBroadcast: Boolean = true): DataFrame = {
    val hint: DataFrame => DataFrame =
      if (hintBroadcast) broadcast else identity
    bandPairs(sigTable)
      .join(hint(sigs.select(col("doc_id").as("doc_a"),
        col("sig").as("sig_a"), col("n_sh").as("n_a"))), "doc_a")
      .join(hint(sigs.select(col("doc_id").as("doc_b"),
        col("sig").as("sig_b"), col("n_sh").as("n_b"))), "doc_b")
      // J ≥ t bounds set sizes within factor 1/t: max·t ≤ min — a cheap
      // cut before the signature comparison
      .filter(greatest(col("n_a"), col("n_b")) * threshold <=
        least(col("n_a"), col("n_b")))
      .withColumn("est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / NumHashes)
      .filter(col("est") >= threshold - 0.25)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  private[graft] def candidatePairsRawCount(sigs: DataFrame): Long =
    bandPairs(sigs).count()

  /** Full pipeline: LSH candidates → signature-estimate prefilter → exact
    * Jaccard verification.
    *
    * The prefilter is the load-bearing scale step: on low-diversity
    * corpora the 16×2 banding admits a large fraction of all pairs
    * (baseline similarity ~0.15 → ~25% of n² candidates), and verifying
    * each against full shingle sets dominated the benchmark (50s at
    * sf0.1). Estimating jaccard as the matching-component fraction of the
    * two 32-long signatures (zip_with over ints, no set materialization)
    * and keeping only estimate ≥ threshold − 0.25 cuts exact verification
    * to the plausible pairs. The 0.25 margin keeps per-pair recall high:
    * est is Binomial(32, s)/32, so at s = threshold, P(est < s − 0.25) =
    * P(shortfall ≥ 8 of 32) < 1%.
    */
  /** NOTE — eager execution semantics: this operator runs Spark jobs AT
    * CALL TIME (localCheckpoint materializes the shingle and signature
    * frames immediately), unlike a normal lazy DataFrame transform. The
    * returned frame is itself checkpointed (a materialized leaf).
    * localCheckpoint blocks are unrecoverable on executor loss and unsafe
    * under dynamic allocation; a long-lived cluster deployment switches
    * to reliable `checkpoint()` with pure configuration — set
    * [[graft.Checkpoints.ReliableKey]]=true plus a checkpoint dir — the
    * lineage-truncation benefit is identical, only the storage differs.
    */
  def nearDuplicates(docs: DataFrame, threshold: Double,
      textCol: String = "text"): DataFrame = {
    // Eager localCheckpoint (not cache): both frames are reused by 4+
    // downstream branches, and cache() leaves the full shingle→signature
    // tree in every branch's ANALYZED plan — analyzer/AQE walks over the
    // repeated subtrees dominated the query at small SF. Checkpointing
    // truncates lineage to a leaf; blocks are freed by the ContextCleaner
    // once the frames go out of scope (the returned result is itself
    // checkpointed, so it holds no reference to them).
    val sh = shingles(docs, textCol).eagerCheckpoint()
    val sigTable = signatures(sh).eagerCheckpoint()
    // int signatures (hashes < 2^31) keep the per-doc footprint small
    // (~150 B); the explicit broadcast hint is size-GATED, because a hint
    // is honored regardless of size — at billions of docs it would OOM
    // the driver. Cheap to decide: sigTable is checkpointed, so count()
    // reads materialized blocks.
    val nDocs = sigTable.count()
    val sizesBySig = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"))
    val sigs = sigTable
      .withColumn("sig",
        array((0 until NumHashes).map(i => col(s"sig_$i").cast("int")): _*))
      .select(col("doc_id"), col("sig"))
      .join(sizesBySig, "doc_id")
    val cand = candidateStage(sigTable, sigs, threshold,
      hintBroadcast = nDocs <= BroadcastDocLimit)
    val sets = sh.groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("shset"))
    val verified = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("set_a")),
        "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("set_b")),
        "doc_b")
      .withColumn("n_inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("n_inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
    // Materialize the (small) pair result eagerly so the returned frame
    // is a leaf: callers re-evaluating it never recompute the pipeline,
    // and the intermediate checkpoint blocks become collectable.
    verified.eagerCheckpoint()
  }
}

/** 64-bit SimHash near-dup sketch: signature = sign-vector of weighted
  * word-hash bits; near pairs via 16-bit chunk banding + Hamming filter.
  */
object SimHash {

  /** Fingerprint width: 60 bits (the md5-60 hash domain), so every bit
    * of the word hash — and therefore the whole fingerprint — replays
    * bit-exactly in the DuckDB oracle (r17; was 64-bit xxhash64).
    */
  val Bits = 60
  private val ChunkBits = Bits / 4 // 15-bit chunks, 4-chunk pigeonhole

  /** doc_id + simhash: Long (60 significant bits). */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(normalize(col(textCol)), " "))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h", KmvSketch.h60(col("word")))
    val bitSums = words.groupBy(col("doc_id")).agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as("b_0"),
      (1 until Bits).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, col("tf"))
          .otherwise(-col("tf"))).as(s"b_$j")): _*)
    val packed = (0 until Bits)
      .map(j => when(col(s"b_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col("doc_id"), packed.as("simhash"))
  }

  /** Pairs with Hamming(simhash) ≤ maxHamming, found by requiring an
    * exact match on ≥1 of the 4 15-bit chunks (guaranteed complete for
    * maxHamming ≤ 3 by pigeonhole).
    */
  def nearPairs(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text"): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only complete up to 3")
    val sigs = simhash(docs, textCol)
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"),
          shiftright(col("simhash"), k * ChunkBits)
            .bitwiseAND((1L << ChunkBits) - 1)
            .as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.k"), col("c.chunk"))
    // Hamming filter BEFORE the pair distinct (same lesson as MinHash's
    // candidateStage): the cheap bit_count cuts raw band pairs down to the
    // few survivors, so distinct shuffles survivors rather than every
    // bucket collision. hamming is a function of the pair, so distinct on
    // (doc_a, doc_b, hamming) ≡ distinct on the pair.
    chunks.alias("a")
      .join(chunks.alias("b"),
        col("a.k") === col("b.k") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
