package graft.functions

/** String-distance kernels shared by the interpreted eval and the
  * generated code of the native expressions (the Spark-core pattern:
  * `Levenshtein` codegen calls `UTF8String.levenshteinDistance` — a
  * static kernel keeps whole-stage codegen alive without inlining a
  * 40-line DP into every generated projection).
  */
object StringAlgos {

  /** Unrestricted Damerau-Levenshtein distance (Lowrance & Wagner,
    * "An extension of the string-to-string correction problem",
    * JACM 22(2) 1975): minimum edits under insert / delete /
    * substitute / transpose-adjacent, where a transposed pair MAY be
    * edited again later — unlike the restricted OSA variant
    * (dl("CA","ABC") = 2 here, 3 under OSA). Matches DuckDB's
    * `damerau_levenshtein` (verified on the CA/ABC witness), which is
    * the oracle contract. Operates on Unicode code points.
    */
  def damerauLevenshtein(sa: String, sb: String): Int = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val (n, m) = (a.length, b.length)
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // (n+2) x (m+2) DP with the Lowrance-Wagner sentinel border
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // last row in `a` where each code point occurred: a flat array for
    // the Latin-1 range (the hot path — q196 evaluates the kernel
    // ~1.3M times per sf0.1 run, and a per-call HashMap dominated it),
    // HashMap only for code points past 255
    val daAscii = new Array[Int](256)
    var daWide: java.util.HashMap[Integer, Integer] = null
    def daGet(cp: Int): Int =
      if (cp < 256) daAscii(cp)
      else if (daWide == null) 0
      else daWide.getOrDefault(cp, 0).intValue()
    def daPut(cp: Int, v: Int): Unit =
      if (cp < 256) daAscii(cp) = v
      else {
        if (daWide == null) daWide = new java.util.HashMap[Integer, Integer]()
        daWide.put(cp, v)
      }
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = daGet(b(j - 1))
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        var best = d(i)(j) + cost // substitute / match
        if (d(i + 1)(j) + 1 < best) best = d(i + 1)(j) + 1 // insert
        if (d(i)(j + 1) + 1 < best) best = d(i)(j + 1) + 1 // delete
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        if (trans < best) best = trans
        d(i + 1)(j + 1) = best
        j += 1
      }
      daPut(a(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }
}
