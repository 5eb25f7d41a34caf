package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q253/q254 shared-census A/B (VERDICT r18 stretch 8). The verdict's
  * premise was that both queries pay the same |source × vocab| token
  * groupBy and "share Chao1Richness.tokenCounts in code" — they do
  * NOT: q253 censuses (source, w), q254 (lang, w); what they share is
  * only the scan + normalize + explode. The candidate shared
  * materialization is therefore the FINER (source, lang, w) count
  * frame, which each query rolls up (counts are summable). This
  * measures whether that actually wins at sf0.1:
  *
  *   A: the two queries as shipped (two scans, two explodes).
  *   B: eager-materialize the (source, lang, w) counts once, roll up
  *      both censuses from it.
  *
  * Correctness guard: B's outputs must equal A's bit-for-bit before
  * the timing means anything.
  *
  * Run: sbt "Test/runMain graft.ProfileSharedCensus"
  */
object ProfileSharedCensus {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 32)
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"

    def minOf(reps: Int)(f: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // ---- A: as shipped
    val tA253 = minOf(2)(
      operators.Chao1Richness.q253.build(spark, src).collect(): Unit)
    val tA254 = minOf(2)(
      operators.DiversityIndex.q254.build(spark, src).collect(): Unit)
    println(f"[shared] A (shipped): q253 $tA253%.2f s + q254 $tA254%.2f s" +
      f" = ${tA253 + tA254}%.2f s")

    // ---- B: one (source, lang, w) materialization, two rollups
    def fineCounts: DataFrame = sources.Tables(spark, src, "documents")
      .select(col("source"), col("lang"),
        explode(split(graft.functions.MockScorers.normalize(col("text")),
          " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
    def q253From(fine: DataFrame): DataFrame =
      operators.Chao1Richness.census(
        fine.groupBy(col("source"), col("w"))
          .agg(sum(col("c")).as("c")))
    // q254's downstream re-derived from the rolled-up (lang, w) counts
    def q254From(fine: DataFrame): DataFrame = {
      val counts = fine.groupBy(col("lang"), col("w"))
        .agg(sum(col("c")).as("c"))
      val coc = counts.groupBy(col("lang"), col("c"))
        .agg(count(lit(1)).as("m"))
      coc.groupBy(col("lang"))
        .agg(sum(col("m") * col("c")).as("n_tokens"),
          sum(col("m")).as("vocab"),
          sum(col("m") * col("c") * (col("c") - 1L)).as("simp_num"),
          sum((col("m").cast("double") * col("c").cast("double") *
            log(col("c").cast("double"))).cast("decimal(30,14)"))
            .cast("double").as("s_nln"))
        .withColumn("simpson",
          when(col("n_tokens") > 1L,
            round(col("simp_num").cast("double") /
              (col("n_tokens").cast("double") *
                (col("n_tokens").cast("double") - 1.0d)), 6)))
        .withColumn("shannon",
          round(log(col("n_tokens").cast("double")) -
            col("s_nln") / col("n_tokens").cast("double"), 6))
        .withColumn("evenness",
          when(col("vocab") > 1L,
            round((log(col("n_tokens").cast("double")) -
              col("s_nln") / col("n_tokens").cast("double")) /
              log(col("vocab").cast("double")), 6)))
        .select(col("lang"), col("n_tokens"), col("vocab"),
          col("simpson"), col("shannon"), col("evenness"))
        .orderBy(col("lang"))
    }

    // correctness first: B ≡ A bit-for-bit
    val fineOnce = Checkpoints.eager(fineCounts)
    val a253 = operators.Chao1Richness.q253.build(spark, src).collect()
    val a254 = operators.DiversityIndex.q254.build(spark, src).collect()
    require(q253From(fineOnce).collect().sameElements(a253),
      "B's q253 rollup diverged from the shipped query")
    require(q254From(fineOnce).collect().sameElements(a254),
      "B's q254 rollup diverged from the shipped query")
    println("[shared] B ≡ A bit-for-bit on both censuses")

    val tB = minOf(2) {
      val fine = Checkpoints.eager(fineCounts)
      q253From(fine).collect()
      q254From(fine).collect(): Unit
    }
    println(f"[shared] B (one materialized (source,lang,w) census + " +
      f"two rollups): $tB%.2f s  vs A ${tA253 + tA254}%.2f s " +
      f"(${(tA253 + tA254) / tB}%.2fx)")
    spark.stop()
  }
}
