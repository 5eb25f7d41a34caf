package graft

import org.apache.spark.sql.functions._

/** A/B: q42's brute inverted-index Jaccard join vs the prefix-filtered
  * [[graft.operators.PpJoin]] path, sf0.1 and the 10× replica corpus
  * (built by [[ProfileSfx]] — run that first, or with
  * SPARK_GRAFT_SFX_REUSE=1). Outputs are count-compared each run so a
  * speed win can never hide a semantics drift.
  */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 32)
    spark.sparkContext.setLogLevel("WARN")
    val sfx = s"${sys.props("java.io.tmpdir")}/graft-sfx1"

    def minOf(reps: Int)(f: => Long): (Double, Long) = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    def ab(label: String, docs: org.apache.spark.sql.DataFrame,
        bruteReps: Int = 2): Unit = {
      val sh = graft.operators.MinHashDedup.shingles(docs)
      val (tB, nB) = minOf(bruteReps)(
        graft.operators.DedupQueries.bruteJaccardPairs(sh, 0.5).count())
      val (tP, nP) = minOf(2)(
        graft.operators.PpJoin.jaccardPairs(sh, 0.5).count())
      require(nB == nP,
        s"pair counts diverge at $label: brute=$nB prefix=$nP")
      println(f"[prof] $label: brute $tB%.2f s ($nB pairs) -> " +
        f"prefix $tP%.2f s (${tB / tP}%.2fx)")
    }

    Seq("sf0.1" -> "/root/testdata/sf0.1", "sfx1" -> sfx).foreach {
      case (label, dir) =>
        if (!new java.io.File(s"$dir/documents.parquet").exists()) {
          println(s"[prof] $label corpus missing at $dir — skipped")
        } else {
          ab(label, spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text")))
        }
    }

    // The regime the prefix filter EXISTS for: boilerplate/stop-word
    // shingles shared corpus-wide. A 12-word suffix appended to every
    // sf0.1 doc plants ~10 shingles at df = 5000 — the brute inverted
    // join pays Σ df² ≈ 10 × 5000² ≈ 250M candidate rows for them; the
    // rarity-ordered prefix drops them from the join entirely.
    val skew = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"), lit(" the quick brown fox jumps over the" +
          " lazy dog end of document marker")).as("text"))
    ab("sf0.1+boilerplate", skew, bruteReps = 1)
    spark.stop()
  }
}
