package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN-tier decade probe (r10 verdict item 7): time AND recall@5 of
  * every approximate tier (sign-LSH q52, IVF q55, PQ q127, IVFADC
  * q131) at sf0.1 and the 10× replica corpus — recall that decays with
  * corpus growth is the failure mode PQ-family indexes are known for,
  * and until this probe the tiers had measured recall at one scale
  * only. Ground truth is the exact q45 brute top-5 on each corpus.
  *
  * Requires the ProfileSfx 10× corpus (run that first, or with
  * SPARK_GRAFT_SFX_REUSE=1).
  *
  * Run: sbt "Test/runMain graft.ProfileAnnDecade"
  */
object ProfileAnnDecade {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 32)
    spark.sparkContext.setLogLevel("WARN")
    val sfx = s"${sys.props("java.io.tmpdir")}/graft-sfx1"

    def topSets(df: DataFrame, idCol: Int): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(idCol))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap

    def minOf(reps: Int)(f: => Map[Long, Set[Long]])
        : (Double, Map[Long, Set[Long]]) = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val m = f
        ((System.nanoTime() - t0) / 1e9, m)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1", "sfx1" -> sfx)
      .filter { case (label, d) =>
        val ok = new java.io.File(s"$d/embeddings.parquet").exists()
        if (!ok) println(s"[prof] $label embeddings missing at $d — skipped")
        ok
      }
    val perTier = scala.collection.mutable.Map
      .empty[String, List[(String, Double, Double)]]
    dirs.foreach { case (label, dir) =>
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val brute = topSets(
        operators.SimilarityQueries.q45.build(spark, dir), 2)
      def recall(approx: Map[Long, Set[Long]]): Double =
        brute.keysIterator.map(q =>
          (approx.getOrElse(q, Set.empty[Long]) intersect brute(q)).size)
          .sum.toDouble / (brute.size * 5)
      val tiers = Seq[(String, () => Map[Long, Set[Long]])](
        ("lsh_q52", () => topSets(
          operators.SketchQueries.q52.build(spark, dir), 2)),
        ("ivf_q55", () => topSets(
          operators.SketchQueries.q55.build(spark, dir), 2)),
        ("pq_q127", () => topSets(
          operators.SketchQueries.q127.build(spark, dir), 1)),
        ("ivfpq_q131", () => topSets(
          operators.SketchQueries.q131.build(spark, dir), 1)))
      tiers.foreach { case (tier, run) =>
        val (t, sets) = minOf(2)(run())
        val r = recall(sets)
        println(f"[prof] $label (n=$n) $tier: $t%.2f s, recall@5 $r%.4f")
        perTier(tier) = perTier.getOrElse(tier, Nil) :+ (label, t, r)
      }
    }
    perTier.toSeq.sortBy(_._1).foreach { case (tier, rs) =>
      if (rs.length == 2) {
        val (_, t1, r1) = rs(0); val (_, t10, r10) = rs(1)
        println(f"[prof] $tier decade: time ${t10 / t1}%.1fx " +
          f"(exponent ${math.log10(t10 / t1)}%.2f), " +
          f"recall $r1%.2f -> $r10%.2f")
      }
    }
    spark.stop()
  }
}
