package graft.operators

import graft.SparkSpec

/** [[Compressibility]] — deflate-ratio quality signal invariants. */
class CompressibilitySpec extends SparkSpec {
  import spark.implicits._

  private def ratioOf(text: String): Double =
    Compressibility.ratios(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head.ratio

  test("repetition compresses far below natural prose; noise above it") {
    val repetitive = ratioOf("spam spam spam spam " * 100)
    val prose = ratioOf(
      "The quick brown fox jumps over the lazy dog while seventeen " +
        "quiet librarians catalog wandering meteor fragments near the " +
        "harbor, and every sentence introduces new vocabulary items " +
        "so the entropy stays close to ordinary English prose levels " +
        "rather than collapsing into repeated phrases or filler noise.")
    // full printable-ASCII noise (~6.5 bits/char); letters-only noise
    // would compress BELOW prose (a-z is 4.7 bits/char)
    val rnd = new scala.util.Random(7)
    val noise = ratioOf(Array.fill(2000)(
      ('!' + rnd.nextInt(94)).toChar).mkString)
    assert(repetitive < 0.05, s"repetition should collapse: $repetitive")
    assert(prose > repetitive * 5, s"prose $prose vs repetitive $repetitive")
    assert(noise > prose, s"random noise $noise should exceed prose $prose")
  }

  test("ratio is deterministic and bounded") {
    val docs = Seq(
      (1L, "hello world " * 50), (2L, "abc"), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val a = Compressibility.ratios(docs).collect().sortBy(_.doc_id)
    val b = Compressibility.ratios(docs).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq, "deflate ratio must be deterministic")
    a.foreach(r => assert(r.ratio > 0, r.toString))
    // real documents stay under ~1; tiny ones can exceed it (deflate's
    // fixed header dominates a 3-byte input) — defined, just not useful
    a.filter(_.n_raw >= 100)
      .foreach(r => assert(r.ratio <= 1.2, r.toString))
    // empty/null text: defined, not NaN
    assert(a.find(_.doc_id == 3L).get.ratio === 1.0)
    assert(a.find(_.doc_id == 4L).get.ratio === 1.0)
  }

  test("withRatio preserves every input column in one pass (no join)") {
    val docs = Seq((1L, "en", "some text here", 42))
      .toDF("doc_id", "lang", "text", "extra")
    val out = Compressibility.withRatio(docs)
    assert(out.columns.toSeq ===
      Seq("doc_id", "lang", "text", "extra", "n_raw", "n_comp", "ratio"))
    val row = out.collect().head
    assert(row.getAs[Int]("extra") === 42)
    assert(row.getAs[Int]("n_raw") === "some text here".length)
    // structurally shuffle-free: a map over the scan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"ratio must ride along without a shuffle:\n$plan")
  }

  test("gate cuts both tails and keeps the original schema") {
    val docs = Seq(
      (1L, "spam spam spam spam " * 100),           // repetition tail
      (2L, "The quick brown fox jumps over the lazy dog while seventeen " +
        "quiet librarians catalog wandering meteor fragments near the " +
        "harbor, and every sentence introduces new vocabulary items " +
        "so the entropy stays close to ordinary English prose levels " +
        "rather than collapsing into repeated phrases or filler noise."),
      (3L, {
        val rnd = new scala.util.Random(11)
        Array.fill(2000)(('!' + rnd.nextInt(94)).toChar).mkString
      }))                                           // entropy tail
      .toDF("doc_id", "text")
    // text's entropy ceiling is ~0.84 (printable ASCII), so the junk
    // cut sits at 0.8 here, not the binary-payload default
    val kept = Compressibility.gate(docs, minRatio = 0.2, maxRatio = 0.8)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }
}
