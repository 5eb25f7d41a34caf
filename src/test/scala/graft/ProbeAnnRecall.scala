package graft

import org.apache.spark.sql.DataFrame

/** Throwaway tuning probe (test scope, not a suite): measures PQ /
  * IVFADC recall@5 against the q45 brute baseline on a given SF dir for
  * a grid of shortlist / nprobe settings. Drives the r10-verdict fix
  * ("pq_at5 0.48") with numbers instead of guesses.
  */
object ProbeAnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(cpus = 8)
    def topSets(df: DataFrame, idCol: Int): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(idCol))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val brute = topSets(operators.SimilarityQueries.q45.build(spark, sfDir), 2)
    def recall(approx: Map[Long, Set[Long]]): Double =
      brute.keysIterator.map(q =>
        (approx.getOrElse(q, Set.empty[Long]) intersect brute(q)).size)
        .sum.toDouble / (brute.size * 5)
    val emb = sources.Tables(spark, sfDir, "embeddings")
    for (sl <- Seq(64, 128, 256)) {
      val r = recall(topSets(
        operators.PqAnn.topK(emb, 0L to 9L, k = 5, shortlist = sl), 1))
      println(f"PQ   shortlist=$sl%4d  recall@5=$r%.4f")
    }
    for (np <- Seq(4, 6, 8); sl <- Seq(64, 128, 256)) {
      val r = recall(topSets(
        operators.IvfPq.topK(emb, 0L to 9L, k = 5, nprobe = np,
          shortlist = sl), 1))
      println(f"IVFPQ nprobe=$np sl=$sl%4d  recall@5=$r%.4f")
    }
    spark.stop()
  }
}
