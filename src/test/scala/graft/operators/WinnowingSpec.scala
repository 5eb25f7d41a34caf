package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.expressions.WinnowSelect

/** Oracle for the winnowing kernel ([[Winnowing.selectSkeys]]):
  * an INDEPENDENT naive reference (explicit per-window scan, explicit
  * "min hash, rightmost position" tie rule — no skey encoding), the
  * paper's detection guarantee as a property, the 2/(w+1) density
  * claim, and the expression's codegen/eval/null discipline.
  */
class WinnowingSpec extends SparkSpec {

  private val P = 1000000007L
  private val K = 4
  private val W = 5

  private def wordVal(s: String): Long =
    s.codePointCount(0, s.length).toLong * 17L +
      (if (s.isEmpty) 0L else s.codePointAt(0).toLong) * 31L +
      (if (s.isEmpty) 0L else s.codePointBefore(s.length).toLong)

  /** Naive reference: every window scanned, ties broken rightmost by an
    * explicit comparison — returns distinct (hash, pos), sorted.
    */
  private def naive(words: IndexedSeq[String], k: Int, w: Int): Seq[(Long, Int)] = {
    val nGrams = words.length - k + 1
    if (nGrams <= 0) return Seq.empty
    val h = (0 until nGrams).map { i =>
      (0 until k).foldLeft(0L)((acc, j) => (acc * 31L + wordVal(words(i + j))) % P)
    }
    val nW = math.max(1, nGrams - w + 1)
    val sel = scala.collection.mutable.LinkedHashSet.empty[(Long, Int)]
    for (j <- 0 until nW) {
      val end = math.min(j + w - 1, nGrams - 1)
      var best = j
      for (p <- j + 1 to end) if (h(p) <= h(best)) best = p // rightmost min
      sel += ((h(best), best))
    }
    sel.toSeq.sortBy(identity)
  }

  private def kernel(words: Seq[String], k: Int, w: Int): Seq[(Long, Int)] = {
    val arr = ArrayData.toArrayData(words.map(UTF8String.fromString).toArray)
    val res = Winnowing.selectSkeys(arr, k, w)
    res.toLongArray().toSeq
      .map(s => (s >> Winnowing.PosBits, (Winnowing.PosMask - (s & Winnowing.PosMask)).toInt))
      .sortBy(identity)
  }

  private def lcgWords(seed0: Long, n: Int, bank: Int): IndexedSeq[String] = {
    var seed = seed0
    (0 until n).map { _ =>
      seed = seed * 1103515245L + 12345L
      "w" + (((seed % bank) + bank) % bank)
    }
  }

  test("kernel matches the naive rightmost-min reference on random docs") {
    for (trial <- 0 until 120) {
      // small banks force repeated words → equal hashes at different
      // positions → the tie rule is actually exercised
      val bank = Seq(3, 5, 40, 1000)(trial % 4)
      val n = trial % 30 // includes n < k, n == k, nGrams < w
      val words = lcgWords(trial * 7919L + 1L, n, bank)
      assert(kernel(words, K, W) === naive(words, K, W),
        s"divergence at trial=$trial n=$n bank=$bank words=$words")
    }
  }

  test("detection guarantee: a shared run of w+k-1 words shares a fingerprint") {
    val t = W + K - 1 // 8 words
    for (trial <- 0 until 100) {
      val run = lcgWords(trial * 104729L + 3L, t, 1000)
      val offA = trial % 13
      val offB = (trial * 5) % 17
      val a = lcgWords(trial * 31L + 7L, offA, 1000) ++ run ++
        lcgWords(trial * 37L + 11L, 20, 1000)
      val b = lcgWords(trial * 41L + 13L, offB, 1000) ++ run ++
        lcgWords(trial * 43L + 17L, 20, 1000)
      val fpsA = kernel(a, K, W).map(_._1).toSet
      val fpsB = kernel(b, K, W).map(_._1).toSet
      assert((fpsA & fpsB).nonEmpty,
        s"guarantee violated at trial=$trial offA=$offA offB=$offB")
    }
  }

  test("selected density is ~2/(w+1) on random input") {
    val words = lcgWords(99L, 4000, 100000)
    val nGrams = words.length - K + 1
    val density = kernel(words, K, W).size.toDouble / nGrams
    // expectation 2/(W+1) = 0.333; wide band, this is a sanity pin not
    // a statistical test
    assert(density > 0.25 && density < 0.42, s"density $density")
  }

  test("position overflow fails loudly, not silently") {
    val words = ArrayData.toArrayData(
      Array.fill((1 << Winnowing.PosBits) + K)(UTF8String.fromString("a")))
    val e = intercept[IllegalArgumentException] {
      Winnowing.selectSkeys(words, K, W)
    }
    assert(e.getMessage.contains("position overflow"))
  }

  test("eval path: null element nulls the result, short doc yields empty") {
    val withNull = Literal.create(Seq[Any]("a", null, "b", "c", "d"),
      ArrayType(StringType, containsNull = true))
    assert(WinnowSelect(withNull, K, W).eval(null) == null)
    val short = Literal.create(Seq[Any]("a", "b"),
      ArrayType(StringType, containsNull = true))
    assert(WinnowSelect(short, K, W).eval(null)
      .asInstanceOf[ArrayData].numElements() === 0)
  }

  test("codegen path: inside whole-stage codegen, parity with eval") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ws", ArrayType(StringType, containsNull = true))))
    val clean = lcgWords(7L, 40, 50)
    val rows = java.util.Arrays.asList(
      Row(1L, Seq[Any]("a", null, "b", "c", "d")),
      Row(2L, clean: Seq[Any]))
    // parquet round-trip: a LocalRelation would be constant-folded and
    // never reach whole-stage codegen
    val dir = tmpDir("winnow")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("id"), WinnowSelect(col("ws"), K, W).as("skeys"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_winnow") && l.trim.startsWith("*")),
      s"graft_winnow fenced out of whole-stage codegen:\n$plan")
    val out = df.orderBy("id").collect()
    assert(out(0).isNullAt(1), "null element must null the selection")
    assert(out(1).getSeq[Long](1) ===
      kernel(clean, K, W).map { case (fp, pos) =>
        fp * Winnowing.PosMod + (Winnowing.PosMask - pos)
      }.sorted)
  }
}
