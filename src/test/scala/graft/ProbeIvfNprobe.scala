package graft

import org.apache.spark.sql.DataFrame

/** One-off tuning probe: plain-IVF recall@5 by (nlist, nprobe) at
  * sf0.1 and the 10× replica corpus — drives the decade-probe finding
  * that q55's recall decays at fixed 16/6 (0.86 → 0.62).
  */
object ProbeIvfNprobe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 8)
    spark.sparkContext.setLogLevel("WARN")
    def topSets(df: DataFrame, idCol: Int): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(idCol))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    for (dir <- Seq("/root/testdata/sf0.1",
        s"${sys.props("java.io.tmpdir")}/graft-sfx1")) {
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val brute = topSets(operators.SimilarityQueries.q45.build(spark, dir), 2)
        def recall(a: Map[Long, Set[Long]]): Double =
          brute.keysIterator.map(q =>
            (a.getOrElse(q, Set.empty[Long]) intersect brute(q)).size)
            .sum.toDouble / (brute.size * 5)
        val emb = sources.Tables(spark, dir, "embeddings")
        val n = emb.count()
        val autoNl = operators.AnnIvf.autoNlist(n)
        val fracSweep = Seq(0.30, 0.375, 0.45).map(f =>
          (autoNl, math.max(8, math.ceil(autoNl * f).toInt)))
        for ((nl, np) <- Seq((16, 6), (16, 8), (16, 10), (32, 12),
            (48, 18)) ++ fracSweep) {
          val t0 = System.nanoTime()
          val r = recall(topSets(
            operators.AnnIvf.topK(emb, 0L to 9L, k = 5, nlist = nl,
              nprobe = np), 2))
          val t = (System.nanoTime() - t0) / 1e9
          println(f"[prof] $dir nlist=$nl nprobe=$np recall@5=$r%.4f ($t%.1f s)")
        }
      }
    }
    spark.stop()
  }
}
