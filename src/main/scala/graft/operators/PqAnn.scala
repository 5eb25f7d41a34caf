package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.VectorFunctions

/** X76 — Product quantization ANN (PQ codes + ADC scan).
  *
  * The missing member of the engine's ANN ladder (brute q45 → sign-LSH
  * q52 → IVF q55 → JL q89 → int8 q65): Jégou et al., "Product
  * quantization for nearest neighbor search" (TPAMI 2011). The vector
  * is split into [[M]] subspaces; each subspace gets its own tiny
  * k-means codebook ([[Ks]] centroids → a 4-bit code), so a 64-dim
  * float vector (256 B) compresses to ONE 32-bit word — 64×. A query
  * is answered with the asymmetric distance computation (ADC): one
  * [[M]]×[[Ks]] lookup table of exact sub-distances per query, then
  * the scan is table-lookups + adds over the packed codes — no float
  * vector is ever read.
  *
  * Spark-first shape: codebooks are trained per subspace on the SAME
  * deterministic sampled-maximin + local-Lloyd trainer the IVF coarse
  * quantizer uses ([[AnnIvf.trainCentroids]] — driver flops on a
  * bounded sample, model is M·Ks·SubDim doubles); encoding is ONE
  * map-side pass (a fused argmin kernel per subspace, packed with
  * integer arithmetic); the ADC scan is a broadcast of Q×(M·Ks) LUT
  * doubles joined map-side, ranked by (dist, vec_id) per query. The
  * only shuffle in the whole operator is the final per-query top-k
  * window over the already-filtered candidate frame.
  *
  * At 100 TB: the PQ code column is what makes exhaustive re-scan
  * viable at all — 4 bytes/vector means a billion vectors fit in
  * 4 GB/executor-scan territory, and the usual production composition
  * (IVF cells from [[AnnIvf]] + PQ codes within each cell) is a
  * one-line join of the two existing operators since both key by
  * vec_id. No reference counterpart (§2.8 extension).
  */
object PqAnn {

  /** Subspaces (codes per vector) — the DEFAULT code budget. The M/Ks
    * product is the bits-per-vector knob: recall past the shortlist cap
    * is bought here, not with a longer re-rank (measured in SCALE.md's
    * past-the-cap probe: at N=100k the 32-bit default holds 0.52@cap
    * while doubling to m=16 — 64-bit codes, same Ks — restores the
    * compressed-domain ranking). Any m dividing the corpus dim with
    * m·4 ≤ 64 bits packs into the single Long code column.
    */
  val M = 8

  /** Dimensions per subspace (M · SubDim = 64, the corpus dim). */
  val SubDim = 8

  /** Codebook size per subspace — 4-bit codes, 2 codes/byte. */
  val Ks = 16

  /** Corpus embedding dimension. */
  private val Dim = 64

  /** Train one codebook per subspace. Returns flat (M × Ks × SubDim)
    * c-major model. Training reuses the IVF trainer per subspace:
    * bounded sample collect, deterministic maximin init, local Lloyd,
    * full restart budget — r10 measured the trimmed `restarts = 2`
    * codebooks costing ~0.1 recall@5 at sf0.1 vs the trainer default
    * (codebook distortion is the whole ADC error budget, and subspace
    * training is driver flops on ≤4096×8 doubles — milliseconds).
    * `iterations` feeds the trainer's DISTRIBUTED refine, which kicks
    * in only once the corpus outgrows the sample cap — the pass a
    * 100 TB encode run needs and the spec corpora never trigger.
    */
  def train(vecs: DataFrame, iterations: Int = 3,
      restarts: Int = 8, m: Int = M): Array[Array[Array[Double]]] = {
    require(Dim % m == 0 && 4 * m <= 64,
      s"m=$m must divide $Dim and pack into 64 bits")
    val subDim = Dim / m
    Array.tabulate(m) { j =>
      AnnIvf.trainCentroids(
        vecs.select(col("vec_id"),
          slice(col("emb"), j * subDim + 1, subDim).as("emb")),
        nlist = Ks, dim = subDim, iterations = iterations,
        restarts = restarts)
    }
  }

  /** Packed 32-bit PQ code column: per subspace a fused argmin over its
    * codebook, packed as Σ code_j · 16^j. One map-side expression — the
    * encode pass a 100 TB corpus runs once and stores.
    */
  def encode(emb: Column, model: Array[Array[Array[Double]]]): Column = {
    val m = model.length
    val subDim = model(0)(0).length
    // disjoint 4-bit lanes ORed together: bitwise ops, not multiply —
    // nibble 15 lands in the sign bits, which ANSI-mode `*` rejects as
    // a long overflow even though the two's-complement pattern is exact
    (0 until m).map { j =>
      shiftleft(
        VectorFunctions.nearestCentroidId(
          slice(emb, j * subDim + 1, subDim),
          model(j).flatten, Ks, subDim).cast("long"), 4 * j)
    }.reduce(_ bitwiseOR _)
  }

  /** The per-query ADC lookup table: exact squared sub-distances from
    * the query's j-th sub-vector to every codebook entry, flattened
    * j-major (M·Ks doubles).
    */
  private[operators] def lut(q: Array[Double],
      model: Array[Array[Array[Double]]]): Array[Double] = {
    val m = model.length
    val subDim = model(0)(0).length
    Array.tabulate(m * Ks) { i =>
      val j = i / Ks
      val c = model(j)(i % Ks)
      var d = 0d; var t = 0
      while (t < subDim) {
        val diff = q(j * subDim + t) - c(t); d += diff * diff; t += 1
      }
      d
    }
  }

  /** ADC distance of a packed code against a LUT array column:
    * Σ_j lutArr[j·Ks + nibble_j(code)]. Integer unpack + array lookup,
    * fully codegen'd — no vector math in the scan.
    */
  private[operators] def adcDist(code: Column, lutArr: Column,
      m: Int = M): Column =
    (0 until m).map { j =>
      // arithmetic shiftright only differs from logical in bits above
      // position 3 after the shift; the & 15 mask discards those, so
      // the top nibble decodes correctly even when the code is negative
      element_at(lutArr,
        shiftright(code, 4 * j).bitwiseAND(lit(15L)).cast("int")
          + lit(j * Ks + 1))
    }.reduce(_ + _)

  /** Top-k per query by RAW ADC distance over the packed-code frame —
    * the pure compressed-domain scan. Output: (qid, vec_id, rank,
    * adc_dist). Exposed for the spec's ADC-consistency oracle and for
    * consumers that want the no-float-reads scan; [[topK]] adds the
    * exact re-rank production uses.
    */
  def adcTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      m: Int = 0): DataFrame = {
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val mm = if (m > 0) m else autoM(vecs.count())
    val model = train(vecs, m = mm)
    val codes = vecs.select(col("vec_id"),
      encode(col("emb"), model).as("code"))

    // bounded collect: only the |Q| query vectors come to the driver,
    // each becoming M·Ks LUT doubles — the planning-frame pattern
    val qRows = vecs.filter(col("vec_id").isin(queryIds: _*)).collect()
    val luts = qRows.map { r =>
      (r.getLong(0), lut(r.getSeq[Double](1).toArray, model))
    }
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qFrame = luts.toSeq.toDF("qid", "lut")

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist"), col("vec_id"))
    codes
      .join(broadcast(qFrame))
      .filter(col("qid") =!= col("vec_id")) // a query is its own 0-dist hit
      .withColumn("adc_dist", adcDist(col("code"), col("lut"), mm))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), col("adc_dist"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Shortlist sizing: recall at a FIXED shortlist decays as the corpus
    * grows (the shortlist/N ratio is what bounds how many true
    * neighbors survive the lossy ADC ranking — r10 measured 0.48@64 on
    * 2k vectors where the 300-vector spec corpus cleared 0.8). The
    * auto rule keeps the ratio at 1/8 until the 1024 cap binds, which
    * bounds the exact re-rank at |Q|·1024 float-vector reads no matter
    * the corpus; past the cap, recall is bought with a bigger code
    * budget (M/Ks), not a longer re-rank. The 128 floor is what the
    * small-corpus end needs (at N=500, shortlist 64 measured 0.86 flat
    * / 0.80 composed — 128 lifts both ≥ 0.88). Measured at sf0.1
    * (N=2000 → shortlist 250): pq recall@5 0.86 — the IVF tier's
    * plateau.
    */
  /** r18 (ProfileAnnKnee, VERDICT r17 item 6): N/8 → N/4. At sf0.1
    * the shipped N/8 shortlist read 0.84 recall@5 while N/4 read 0.98
    * and N/2 = 1.00 — below the 1024 cap the re-rank is the cheap
    * stage, so the ratio was the binding constraint, not code
    * resolution. Past N = 4096 the cap binds exactly as before (the
    * 100 TB behavior is unchanged; m = 16 via [[autoM]] remains the
    * past-the-cap recall knob, ProfileAnnCap's N=100k measurements).
    */
  private[operators] def autoShortlist(n: Long): Int =
    math.max(128L, math.min(1024L, n / 4)).toInt

  /** Auto code budget (VERDICT r12 item 3 — the same gap
    * [[AnnIvf.autoNlist]] closed for the cell count): while the corpus
    * is small enough that the shortlist cap does NOT bind
    * (N ≤ 8·1024, where the N/8 rule keeps the re-rank ratio fixed),
    * the 32-bit m=8 code is enough — every measured point ≤ 8k holds
    * recall@5 ≥ 0.84. Past the bind point the re-rank ratio shrinks
    * and ADC code resolution becomes the binding constraint: the
    * N=100k probe (ProfileAnnCap) measured m=8 decaying to 0.52 (PQ) /
    * 0.70 (IVFADC) with nprobe doubling NOT fixing it (0.72), while
    * m=16 — 64-bit codes, same Ks — restores 0.96 / 0.92. So: m=8
    * while the cap is slack, m=16 beyond. 4-bit nibbles cap packing at
    * m=16 per 64-bit code; past ~2²⁰ vectors the next budget step is
    * Ks growth or a wider code column — documented, not auto.
    */
  def autoM(n: Long): Int = if (n <= 8L * 1024L) M else 16

  /** Production PQ search: ADC shortlist of [[autoShortlist]] (or an
    * explicit `shortlist > 0`) candidates in the compressed domain,
    * then EXACT squared-L2 re-rank of only those — the standard
    * two-stage recipe (and the engine's q65 int8 precedent). The exact
    * pass reads `|Q|·shortlist` float vectors instead of the corpus;
    * the corpus-wide scan touched only the 4-byte codes. Output:
    * (qid, vec_id, rank, dist) with dist exact.
    */
  def topK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      shortlist: Int = 0, m: Int = 0): DataFrame = {
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val n = vecs.count()
    val sl = if (shortlist > 0) shortlist else autoShortlist(n)
    val cand = adcTopK(embeddings, queryIds, sl,
      if (m > 0) m else autoM(n))
      .select(col("qid"), col("vec_id"))
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qVecs = vecs.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    cand
      .join(vecs, "vec_id")
      .join(broadcast(qVecs), "qid")
      // in-order diff-square sum: identical op order to a driver-side
      // loop, so rankings can't split on float association
      .withColumn("dist", aggregate(
        zip_with(col("emb"), col("qemb"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), col("dist"))
      .orderBy(col("qid"), col("rank"))
  }
}
