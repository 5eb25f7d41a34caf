package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** b-bit MinHash (X67; Li & König, "b-Bit Minwise Hashing", WWW 2010):
  * store only the lowest `b` bits of each of the 32 MinHash values, so
  * a document's whole signature packs into ONE 64-bit word (b = 2) —
  * a 32× smaller dedup index than [[MinHashDedup.signatures]]'s 32
  * longs, which at 100 TB is the difference between a signature store
  * that fits executor memory and one that doesn't. The price is a
  * known, correctable collision bias: a lane matches with probability
  * J + (1−J)/2ᵇ, so the unbiased estimator is
  * Ĵ = (C − 2⁻ᵇ) / (1 − 2⁻ᵇ) for lane-match fraction C.
  *
  * Everything is codegen'd column arithmetic — packing is a fold of
  * shifts/ors over the sig columns; lane comparison is the classic
  * SWAR trick on the XOR (a 2-bit lane differs iff either of its bits
  * does: `(x | x>>1) & 0x5555…` marks differing lanes, one `bit_count`
  * finishes), no UDFs, no per-row allocation.
  */
object BbitMinHash {

  /** Bits kept per hash lane. 2 bits × 32 hashes = one packed long. */
  val B = 2
  private val Lanes = MinHashDedup.NumHashes // 32
  private val OddMask = 0x5555555555555555L  // low bit of every 2-bit lane

  /** (doc_id, bsig): the 32 × 2-bit packed signature word, from
    * [[MinHashDedup.signatures]]'s (doc_id, sig_0..sig_31) frame.
    * Lane i occupies bits [2i, 2i+1].
    */
  def pack(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      (0 until Lanes).map(i =>
        shiftleft(col(s"sig_$i").bitwiseAND(lit(3L)), 2 * i))
        .reduce(_.bitwiseOR(_)).as("bsig"))

  /** Number of MATCHING 2-bit lanes between two packed words. */
  def matchingLanes(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    // differing lanes: either bit set → mark the lane's low bit, count
    lit(Lanes) - bit_count(
      x.bitwiseOR(shiftright(x, 1)).bitwiseAND(lit(OddMask)))
  }

  /** The Li–König unbiased Jaccard estimate from lane matches. */
  def estimate(a: Column, b: Column): Column = {
    val c = matchingLanes(a, b).cast("double") / lit(Lanes.toDouble)
    val floor = 1.0 / (1 << B)
    (c - lit(floor)) / lit(1.0 - floor)
  }

  /** Candidate pairs whose b-bit estimate clears `tauEst`, from the
    * SAME LSH band join [[MinHashDedup.nearDuplicates]] mines — the
    * b-bit word replaces the 32-long signature in the VERIFY step, so
    * the probe reads 1/32 of the signature bytes; exact-Jaccard
    * verification stays available downstream for the survivors (the
    * two-stage discipline q55's quantized coarse pass established).
    * Returns (doc_a, doc_b, lanes_match, j_est).
    */
  def nearDuplicates(docs: DataFrame, tauEst: Double): DataFrame = {
    import graft.Checkpoints.EagerCheckpoint
    // the signatures frame feeds BOTH pack() and candidatePairs();
    // without truncation the shingle→minhash lineage (the expensive
    // text-scanning face) would execute twice — same discipline as
    // MinHashDedup.nearDuplicates (SketchDedup.scala:164)
    val sigs = MinHashDedup.signatures(MinHashDedup.shingles(docs))
      .eagerCheckpoint()
    val packed = pack(sigs)
    val cand = MinHashDedup.candidatePairs(sigs)
    cand
      .join(packed.select(col("doc_id").as("doc_a"),
        col("bsig").as("ba")), "doc_a")
      .join(packed.select(col("doc_id").as("doc_b"),
        col("bsig").as("bb")), "doc_b")
      .withColumn("lanes_match", matchingLanes(col("ba"), col("bb")))
      .withColumn("j_est", round(estimate(col("ba"), col("bb")), 6))
      .filter(col("j_est") >= tauEst)
      .select(col("doc_a"), col("doc_b"), col("lanes_match"), col("j_est"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
