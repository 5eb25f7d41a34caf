package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** Byte-pair-encoding tokenizer training and application — the step a
  * training-data pipeline runs AFTER curation: learn the merge table
  * from the corpus, then tokenize every document with it (q49's
  * whitespace/regex counts are the pre-tokenizer estimate; this is the
  * real thing). Extends the q86 kernel (X38) from "first merge" to the
  * full train loop + an encoder expression.
  *
  * Scale shape (the reason this works at 100 TB): the ONLY corpus-sized
  * job is the vocabulary aggregation — one token-explode shuffle,
  * exactly q86's. Training then iterates on the vocab alone, which is
  * corpus-size-INDEPENDENT (Heaps' law: millions of types for trillions
  * of tokens) and capped here at `vocabCap` most-frequent words (the
  * same bounded-collect discipline as the IVF centroid sample and
  * `Limits.InListRows`; rare tail words add pair counts ≈ their own
  * frequency — negligible mass — and SentencePiece/HF trainers prune
  * the same way). Encoding broadcasts the merge table inside the
  * expression (a few KB) and runs as a map-only pass: no shuffle, no
  * UDF, stays inside whole-stage codegen via a static helper call.
  *
  * Determinism: ties in pair counts break (count desc, left asc, right
  * asc) — the q86 ordering — and the vocab cap breaks (count desc, word
  * asc), so train() is bit-stable across runs, partitionings, and
  * retries.
  */
object Bpe {

  /** Corpus vocabulary: (w, wc) — the one corpus-sized aggregation. */
  def vocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(normalize(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))

  /** Learn `nMerges` merges from the corpus. Driver memory is bounded
    * by `vocabCap` words (default 64k ≈ a few MB), never corpus size —
    * the cluster's share is the single vocab aggregation; training then
    * runs on the driver via [[trainFromVocab]].
    */
  def train(docs: DataFrame, nMerges: Int, vocabCap: Int = 1 << 16,
      textCol: String = "text"): Seq[(String, String)] = {
    val top = vocab(docs, textCol)
      .orderBy(col("wc").desc, col("w").asc)
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromVocab(top.toSeq, nMerges)
  }

  /** The classic INCREMENTAL trainer (Sennrich 2016's released
    * implementation refines the same way): pair counts and a
    * pair→word-occurrence index are built once, and each merge round
    * re-counts ONLY the words that contain the winning pair —
    * decrement the word's old adjacent pairs, rewrite it, increment
    * the new ones. The argmax is a lazy-deletion max-heap: every count
    * change pushes a (count, pair) snapshot, and pops discard
    * snapshots that no longer match the live count — so each round's
    * winner costs O(log heap) amortized instead of a full scan of the
    * live pair set. Per-round cost is O(Σ|affected word| · log) instead
    * of O(vocab × word length): occurrence sets shrink geometrically
    * with pair frequency, so a production 32k-merge train is dominated
    * by the early frequent merges rather than paying the full-vocab
    * scan 32k times (ProfileBpe measures the gap at 1k merges / 64k
    * words).
    *
    * Determinism: the heap comparator (count desc, left asc, right
    * asc) is the same strict total order the naive loop's argmax uses,
    * and a valid snapshot exists for every live pair's CURRENT count
    * (each change pushes one), so the first non-stale pop IS the true
    * argmax — bit-identical to the naive rescan-everything loop on any
    * input (BpeSpec pins equality).
    */
  def trainFromVocab(vocabCounts: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    val words: Array[Array[String]] =
      vocabCounts.map(_._1.map(_.toString).toArray).toArray
    val wc: Array[Long] = vocabCounts.map(_._2).toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occur = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // max-heap of (count, left, right) snapshots; stale entries are
    // discarded at pop time by comparing against the live count
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(a: (Long, String, String),
            b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c
          else {
            val l = b._2.compareTo(a._2) // smaller left wins ties
            if (l != 0) l else b._3.compareTo(a._3)
          }
        }
      })

    // inc pushes the exact new count; dec pushes nothing (a stale-HIGH
    // snapshot is repaired at pop time), so heap traffic ∝ created
    // adjacencies, not every touched one
    def inc(k: (String, String), c: Long, idx: Int): Unit = {
      val n = counts.getOrElse(k, 0L) + c
      counts.update(k, n)
      occur.getOrElseUpdate(k, mutable.BitSet.empty) += idx
      heap.enqueue((n, k._1, k._2))
    }
    // occurrence-index membership is NOT retracted here: the word may
    // hold the pair at another position, and a stale index entry only
    // costs a no-op scan when that pair later wins (counts stay exact
    // either way)
    def dec(k: (String, String), c: Long): Unit = {
      val n = counts.getOrElse(k, 0L) - c
      if (n <= 0L) { counts.remove(k); occur.remove(k) }
      else counts.update(k, n)
    }

    // SITE-LOCAL rewrite: merging (a,b) at one site only disturbs the
    // three adjacencies around it — (prev,a), (a,b), (b,next) die and
    // (prev,ab), (ab,next) are born — so a word updates O(sites) pairs,
    // not O(|word|). `prev` is read from the rewritten prefix so
    // back-to-back sites chain correctly (…abab… → (ab,ab)).
    def mergeWord(idx: Int, a: String, b: String, ab: String): Unit = {
      val syms = words(idx); val c = wc(idx); val len = syms.length
      val out = new Array[String](len)
      var o = 0; var i = 0
      while (i < len) {
        if (i < len - 1 && syms(i) == a && syms(i + 1) == b) {
          if (o > 0) { dec((out(o - 1), a), c); inc((out(o - 1), ab), c, idx) }
          dec((a, b), c)
          if (i + 2 < len) { dec((b, syms(i + 2)), c); inc((ab, syms(i + 2)), c, idx) }
          out(o) = ab; o += 1; i += 2
        } else { out(o) = syms(i); o += 1; i += 1 }
      }
      if (o < len) words(idx) = java.util.Arrays.copyOfRange(
        out.asInstanceOf[Array[AnyRef]], 0, o).asInstanceOf[Array[String]]
    }

    // build counts without per-position heap pushes, then seed one
    // snapshot per live pair
    words.indices.foreach { idx =>
      val syms = words(idx); var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts.update(k, counts.getOrElse(k, 0L) + wc(idx))
        occur.getOrElseUpdate(k, mutable.BitSet.empty) += idx
        i += 1
      }
    }
    counts.foreach { case (k, n) => heap.enqueue((n, k._1, k._2)) }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.size < nMerges && counts.nonEmpty) {
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (n, l, r) = heap.dequeue()
        val cur = counts.getOrElse((l, r), -1L)
        if (cur == n) best = (l, r)
        // decremented since this snapshot: re-enter at the live count
        // so it still competes (and wins ties) at its true rank
        else if (cur > 0L) heap.enqueue((cur, l, r))
      }
      require(best != null,
        "heap exhausted while live pairs remain — snapshot invariant broken")
      merges += best
      val ab = best._1 + best._2
      occur.get(best).map(_.toArray).getOrElse(Array.emptyIntArray)
        .foreach(mergeWord(_, best._1, best._2, ab))
      // every occurrence of the winner was just rewritten away; a
      // residual count means the occurrence index lost track of a word
      require(!counts.contains(best),
        s"incremental pair index out of sync after merging $best")
    }
    merges.toSeq
  }

  /** One training round's rewrite: merge every left-to-right
    * non-overlapping occurrence of `pair` (classic Sennrich 2016).
    */
  def applyMerge(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Merge table → rank lookup keyed "left<NUL>right" (NUL can't occur
    * inside a symbol: symbols come from whitespace-split text). Java
    * HashMap so the codegen'd helper call needs no Scala runtime
    * conversions on the hot path.
    */
  def ranks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + "\u0000" + b, Integer.valueOf(i))
    }
    m
  }

  /** Greedy BPE segmentation of one word: repeatedly merge the
    * lowest-rank adjacent pair until none ranks. Segmentation is
    * lossless: tokens concatenate back to the word.
    */
  def encodeWord(w: String,
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = w.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestIdx = i
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = applyMerge(syms, (syms(bestIdx), syms(bestIdx + 1)))
    }
    syms
  }

  /** Static helper the codegen'd expression calls: BPE token count of a
    * whitespace-separated text under `ranks`.
    */
  def countTokens(text: String,
      ranks: java.util.HashMap[String, Integer]): Int = {
    var n = 0
    var start = 0
    val len = text.length
    while (start <= len) {
      var end = text.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) n += encodeWord(text.substring(start, end), ranks).length
      start = end + 1
    }
    n
  }
}
