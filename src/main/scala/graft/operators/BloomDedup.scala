package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter membership pre-filter for incremental dedup — the cheap
  * gate IN FRONT of the exact machinery. [[IncrementalDedup]]'s bucketed
  * index answers "which corpus doc does this near-match?"; most ingest
  * rows don't near-match anything, and at 100 TB the cheapest possible
  * "definitely new" answer is a bloom filter: ~1.2 bytes per indexed
  * item at ~1% FPP, no join, no shuffle, evaluated inside whole-stage
  * codegen on the scan. False positives route a small excess to the
  * exact verify (which rejects them); false negatives are impossible,
  * so the gate never loses a duplicate.
  *
  * Hashing is PINNED, engine-neutral md5-60 double hashing (Kirsch &
  * Mitzenmacher 2006: pos_i = (h1 + i·h2) mod m from two base hashes),
  * k = 7 lanes at m = 9.6·n bits — the optimum near 1% FPP. r18
  * (VERDICT r17 item 3): the earlier build used Spark's
  * `stat.bloomFilter`, whose Murmur3-based bit layout is engine-private
  * — correct, but unverifiable by the DuckDB driver gate. With the
  * [[KmvSketch.h60]] lanes the ENTIRE bit pattern (false positives
  * included) replays in SQL as a distinct-position set, so q85 is
  * hash-exact rather than rows-only — the q43/q44 precedent applied to
  * the bloom.
  *
  * Build is a mergeable fixed-size `Aggregator`: each partition ORs fp
  * positions into one m-bit word array, partials combine pairwise
  * (commutative, associative — the same partial-aggregation shape as
  * Spark's own sketch builds), and ONLY the finished bitmap reaches
  * the driver — sized by capacity, never by corpus bytes. Probe embeds
  * the word array as an array literal; each lane is a pure Column tree
  * (two md5s shared across lanes by codegen CSE, then shift/AND), so
  * the gate stays inside whole-stage codegen with no join.
  */
object BloomDedup {

  /** Lanes: k = 7 ≈ (m/n)·ln 2 at 9.6 bits/item → FPP ≈ 1%. */
  val K = 7

  /** Hard capacity ceiling for this LITERAL-EMBEDDING bloom (ADVICE
    * r18): the probe splices the whole word array into the plan as an
    * array literal referenced by all [[K]] lanes, so the bitmap must
    * stay plan-sized — 2^30 items ≈ 1.2 GiB of bitmap is already past
    * the practical literal budget, and at (2^31·64)/9.6 ≈ 14.3e9 items
    * the `(m/64).toInt` word index would overflow outright. Above this
    * cap the right tool is a different SHAPE, not a bigger literal:
    * hoist the words into a broadcast variable probed by a native
    * expression, or shard one filter per ingest partition/day (the
    * X46 incremental-index layout already gives that partitioning).
    */
  val MaxExpectedItems: Long = 1L << 30

  /** Bitmap size in bits for `n` expected items: 9.6·n rounded up to a
    * whole 64-bit word, in PURE INTEGER arithmetic (the +1 keeps m > 0
    * for an empty corpus) so the DuckDB oracle recomputes the identical
    * m from the same COUNT(*). Refuses capacities past
    * [[MaxExpectedItems]] loudly instead of overflowing silently.
    */
  def mBits(n: Long): Long = {
    require(n >= 0L && n <= MaxExpectedItems,
      s"BloomDedup capacity $n outside [0, $MaxExpectedItems]: the " +
        "bitmap is embedded as a plan literal — broadcast or shard " +
        "the filter instead of growing it (see MaxExpectedItems)")
    val raw = (n * 96L) / 10L + 1L
    ((raw + 63L) / 64L) * 64L
  }

  /** JVM twin of [[KmvSketch.h60]] — md5 hex of the UTF-8 string, first
    * 15 hex digits as a 60-bit non-negative long. Bit-identical to the
    * Column form (Spark `md5` is the same RFC 1321 digest of the same
    * bytes), pinned by GraftBloomSpec's cross-check.
    */
  def h60jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** The k bit positions of fingerprint `fp` in an m-bit filter.
    * h1, h2 < 2^60 and k ≤ 7 keep h1 + i·h2 < 2^63 — no overflow,
    * no sign games, on either engine.
    */
  def positions(fp: Long, m: Long): Seq[Long] = {
    val h1 = h60jvm("b1:" + fp)
    val h2 = h60jvm("b2:" + fp)
    (0 until K).map(i => (h1 + i.toLong * h2) % m)
  }

  /** Finished filter: the word array plus its modulus. */
  final case class BloomSketch(m: Long, words: Array[Long])

  private final class BloomAgg(m: Long)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long]((m / 64L).toInt)
    override def reduce(b: Array[Long], fp: Long): Array[Long] = {
      positions(fp, m).foreach { p =>
        b((p / 64L).toInt) |= 1L << (p % 64L).toInt
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /** Build the filter over `fps`'s LongType column `fpCol`.
    * `expectedItems` sizes the bitmap: insertions beyond it degrade
    * FPP, never correctness.
    */
  def build(fps: DataFrame, fpCol: String, expectedItems: Long)
      : BloomSketch = {
    val m = mBits(expectedItems)
    val agg = new BloomAgg(m)
    val words = fps
      .select(udaf(agg, Encoders.scalaLong)(col(fpCol)).as("bm"))
      .head().getAs[scala.collection.Seq[Long]](0).toArray
    BloomSketch(m, words)
  }

  /** Probe column: true when `value` (LongType fingerprint) might be in
    * `bloom`; false means definitely absent.
    */
  def mightContain(bloom: BloomSketch, value: Column): Column = {
    val wordsLit = typedLit(bloom.words.toSeq)
    val powLit = typedLit((0 until 64).map(i => 1L << i))
    val h1 = KmvSketch.h60(concat(lit("b1:"), value.cast("string")))
    val h2 = KmvSketch.h60(concat(lit("b2:"), value.cast("string")))
    (0 until K).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(bloom.m))
      val word = element_at(wordsLit, (pos / 64L).cast("int") + 1)
      val bit = element_at(powLit, pmod(pos, lit(64L)).cast("int") + 1)
      word.bitwiseAND(bit) =!= 0L
    }.reduce(_ && _)
  }

  /** The DuckDB mirror of one probe lane's position, for oracle SQL:
    * `(h1 + i·h2) % m` with h1/h2 as [[KmvSketch.h60Sql]] over the
    * fingerprint's decimal string.
    */
  def posSql(fpExpr: String, lane: String, mExpr: String): String = {
    val h1 = KmvSketch.h60Sql(s"'b1:' || CAST($fpExpr AS VARCHAR)")
    val h2 = KmvSketch.h60Sql(s"'b2:' || CAST($fpExpr AS VARCHAR)")
    s"(($h1) + ($lane) * ($h2)) % ($mExpr)"
  }
}
