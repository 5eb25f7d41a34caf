package graft.operators

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Winnowing document fingerprinting (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003 — the MOSS algorithm), the shifted-run complement to
  * [[SpanDedup]]: fixed non-overlapping blocks (q82) miss a verbatim
  * run that starts mid-block, winnowing's guarantee is positional —
  * ANY shared word run of length ≥ w + k − 1 shares at least one
  * selected fingerprint, at an expected selected density of only
  * 2/(w+1) of all k-gram positions.
  *
  * Per document: hash every k-word gram (the q50 polynomial over the
  * q50 per-word values, so the DuckDB oracle can rebuild hashes
  * bit-for-bit), then slide a w-gram window and select the minimum in
  * each window, ties broken toward the RIGHTMOST position. Both rules
  * are fused into one comparison by encoding each gram as
  *
  *   skey = hash · 2^21 + (2^21 − 1 − pos)
  *
  * so a plain `min` picks (smallest hash, then largest pos) — the same
  * single `min(skey) OVER (ROWS BETWEEN CURRENT ROW AND w−1
  * FOLLOWING)` the SQL oracle runs, with no argmin gymnastics on
  * either engine. Positions must fit 21 bits (≤ 2,097,152 grams per
  * document — fail-loud below, not silent corruption).
  *
  * Scale shape: selection happens INSIDE [[
  * graft.functions.expressions.WinnowSelect]] (one codegen'd pass,
  * O(n) via a monotonic deque), so only the selected ~2/(w+1) density
  * of (doc_id, skey) pairs is ever exploded and shuffled — the oracle's
  * explode-every-gram window formulation is the CORRECTNESS mirror,
  * not the plan. Downstream joins/aggregations carry longs, never
  * text, q40's discipline.
  */
object Winnowing {

  private val P = 1000000007L
  /** Position bits in the skey encoding: pos ∈ [0, 2^21). */
  val PosBits = 21
  val PosMask: Long = (1L << PosBits) - 1 // 2097151
  val PosMod: Long = 1L << PosBits        // 2097152

  /** Selected fingerprint keys of one document, ascending and distinct.
    * `words` is the normalized whitespace split; returns null on a null
    * element (the [[graft.functions.expressions.WordFingerprint]] fold
    * discipline), empty for documents shorter than k words.
    *
    * Shared verbatim by the expression's interpreted eval and its
    * generated code, so the two paths cannot diverge.
    */
  def selectSkeys(words: ArrayData, k: Int, w: Int): ArrayData = {
    val n = words.numElements()
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])
    require(nGrams <= PosMod,
      s"winnowing position overflow: $nGrams grams > 2^$PosBits per doc")

    val v = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) return null
      val u = words.getUTF8String(i)
      val s = u.toString
      val first = if (s.isEmpty) 0 else s.codePointAt(0)
      val last = if (s.isEmpty) 0 else s.codePointBefore(s.length)
      v(i) = u.numChars().toLong * 17L + first.toLong * 31L + last.toLong
      i += 1
    }

    val skey = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + v(i + j)) % P; j += 1 }
      skey(i) = acc * PosMod + (PosMask - i)
      i += 1
    }

    // one min per window j ∈ [0, nW): window covers [j, min(j+w-1, last)]
    // — a monotonic deque keeps this O(nGrams); skeys are distinct by
    // construction (pos embedded) so the min is unique per window
    val nW = math.max(1, nGrams - w + 1)
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    val out = new Array[Long](nW)
    var nOut = 0
    var p = 0
    var j = 0
    while (j < nW) {
      val end = math.min(j + w - 1, nGrams - 1)
      while (p <= end) {
        while (tail > head && skey(deque(tail - 1)) >= skey(p)) tail -= 1
        deque(tail) = p
        tail += 1
        p += 1
      }
      while (deque(head) < j) head += 1
      val sel = skey(deque(head))
      // adjacent windows reselect the same gram; once a gram stops being
      // selected it never returns (the new smaller gram outlives it), so
      // consecutive dedupe yields the distinct set
      if (nOut == 0 || out(nOut - 1) != sel) { out(nOut) = sel; nOut += 1 }
      j += 1
    }
    val res = java.util.Arrays.copyOf(out, nOut)
    java.util.Arrays.sort(res)
    new GenericArrayData(res)
  }
}
