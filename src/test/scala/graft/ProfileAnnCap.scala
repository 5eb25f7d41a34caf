package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Past-the-shortlist-cap ANN probe (VERDICT r11 item 3): the adaptive
  * shortlist rule (N/8 clamped to [128, 1024]) binds at N ≈ 8k, and
  * until this probe the claim "past the cap recall is bought with
  * bigger M/Ks or shortlist" was unmeasured. This builds a 50× replica
  * embeddings corpus (100k vectors — the cap oversizes the re-rank by
  * 12×) with the ProfileSfx cyclic-shift transform (shift r·7 mod 64 is
  * distinct for all r < 64, so within-replica cosine structure scales
  * ×50 exactly) and measures, against per-corpus exact brute truth:
  *
  *   - every tier at its DEFAULTS (what a user gets at N ≫ cap),
  *   - PQ and IVFADC with the cap lifted (shortlist = N/8 = 12.5k) —
  *     pricing exactly what the 1024 cap costs in recall,
  *   - IVFADC at double nprobe — the other recall knob at fixed cap.
  *
  * Run AFTER ProfileSfx (reuses nothing from it; builds its own dir):
  *   sbt "Test/runMain graft.ProfileAnnCap"   # auto-m arms added r13
  * Reuse the built corpus with SPARK_GRAFT_SFX_REUSE=1.
  */
object ProfileAnnCap {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 32)
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val dst = s"${sys.props("java.io.tmpdir")}/graft-sfx50emb"
    val reuse = sys.env.get("SPARK_GRAFT_SFX_REUSE").contains("1") &&
      new java.io.File(s"$dst/embeddings.parquet").exists()
    if (!reuse) {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val dim = 64
      val embOffset = 100000L
      val replicas = (0 until 50).map { r =>
        val s = (r * 7) % dim
        val e = emb.withColumn("vec_id", col("vec_id") + lit(r * embOffset))
        if (s == 0) e
        else e.withColumn("embedding",
          concat(slice(col("embedding"), s + 1, dim - s),
            slice(col("embedding"), 1, s)))
      }
      replicas.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    }
    val emb = sources.Tables(spark, dst, "embeddings")
    val n = emb.count()
    println(s"[prof] sfx50emb vectors = $n")

    def topSets(df: DataFrame, qCol: Int, idCol: Int)
        : Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(qCol), r.getLong(idCol)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val brute = topSets(
      operators.SimilarityQueries.q45.build(spark, dst), 0, 2)
    def recall(a: Map[Long, Set[Long]]): Double =
      brute.keysIterator.map(q =>
        (a.getOrElse(q, Set.empty[Long]) intersect brute(q)).size)
        .sum.toDouble / (brute.size * 5)

    val q = 0L to 9L
    val arms = Seq[(String, () => Map[Long, Set[Long]])](
      ("lsh_default", () => topSets(
        operators.AnnLsh.topK(emb, q, k = 5), 0, 2)),
      ("ivf_auto", () => topSets(
        operators.AnnIvf.topK(emb, q, k = 5), 0, 2)),
      // m=8 PINNED at the fixed cap — the decay the auto rule exists
      // to fix (r12 measured 0.52/0.70 here)
      ("pq_capped_m8", () => topSets(
        operators.PqAnn.topK(emb, q, k = 5, m = 8), 0, 1)),
      ("pq_uncapped_n8", () => topSets(
        operators.PqAnn.topK(emb, q, k = 5, m = 8,
          shortlist = (n / 8).toInt), 0, 1)),
      ("ivfpq_capped_m8", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5, m = 8), 0, 1)),
      ("ivfpq_uncapped_n8", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5, m = 8,
          shortlist = (n / 8).toInt), 0, 1)),
      ("ivfpq_2x_nprobe", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5, m = 8, nprobe =
          2 * operators.AnnIvf.autoNprobe(
            operators.AnnIvf.autoNlist(n))), 0, 1)),
      // the DEFAULTS: PqAnn.autoM must pick m=16 here (N ≫ 8·cap) and
      // restore the compressed-domain ranking on its own — the r12
      // "nothing auto-selects m" gap, closed (VERDICT r12 item 3)
      ("pq_auto_default", () => topSets(
        operators.PqAnn.topK(emb, q, k = 5), 0, 1)),
      ("ivfpq_auto_default", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5), 0, 1)))
    arms.foreach { case (name, run) =>
      val t0 = System.nanoTime()
      val r = recall(run())
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[prof] n=$n $name: recall@5 $r%.4f ($t%.1f s)")
    }
    ProfileCleanup(dst)
    spark.stop()
  }
}
