package graft

import org.apache.spark.sql.DataFrame

/** ANN recall-knee sweep at sf0.1 (VERDICT r17 item 6): ivf/pq/ivfpq
  * read 0.84 recall@5 under the auto rules while sign-LSH reads 0.92 —
  * the auto constants were tuned for N-SCALING (the decade probes),
  * not for the recall plateau at one scale. This measures, against the
  * same brute-force truth the bench uses, what each tier's recall
  * knobs buy at sf0.1:
  *
  *   - IVF: nprobe fraction 0.45 (shipped) → 0.55 / 0.60 / 0.75 / 1.0
  *     (1.0 probes every cell = exhaustive within IVF's exact-distance
  *     scoring, so its reading is the tier's ceiling — any gap to 1.0
  *     recall there would be assignment/train noise, not probe count),
  *   - PQ: shortlist auto (N/8 → cap 1024) → N/4 → N/2, and m 8 → 16
  *     at the auto shortlist (code resolution vs re-rank budget),
  *   - IVFADC: nprobe fraction 0.55 (shipped) → 0.70 / 0.85 at auto
  *     shortlist, plus shortlist N/4 at the shipped fraction.
  *
  * One command:  sbt "Test/runMain graft.ProfileAnnKnee"
  * Output: one `[knee] arm recall@5 secs` line per arm → SCALE.md.
  */
object ProfileAnnKnee {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 32)
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val emb = sources.Tables(spark, src, "embeddings")
    val n = emb.count()
    println(s"[knee] sf0.1 vectors = $n")

    def topSets(df: DataFrame, qCol: Int, idCol: Int)
        : Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(qCol), r.getLong(idCol)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val brute = topSets(
      operators.SimilarityQueries.q45.build(spark, src), 0, 2)
    def recall(a: Map[Long, Set[Long]]): Double =
      brute.keysIterator.map(q =>
        (a.getOrElse(q, Set.empty[Long]) intersect brute(q)).size)
        .sum.toDouble / (brute.size * 5)

    val q = 0L to 9L
    val nlist = operators.AnnIvf.autoNlist(n)
    def frac(f: Double): Int = operators.AnnIvf.autoNprobe(nlist, f)
    val arms = Seq[(String, () => Map[Long, Set[Long]])](
      ("ivf_default", () => topSets(
        operators.AnnIvf.topK(emb, q, k = 5), 0, 2)),
      ("ivf_f055", () => topSets(
        operators.AnnIvf.topK(emb, q, k = 5, nprobe = frac(0.55)), 0, 2)),
      ("ivf_f060", () => topSets(
        operators.AnnIvf.topK(emb, q, k = 5, nprobe = frac(0.60)), 0, 2)),
      ("ivf_f075", () => topSets(
        operators.AnnIvf.topK(emb, q, k = 5, nprobe = frac(0.75)), 0, 2)),
      ("ivf_f100_ceiling", () => topSets(
        operators.AnnIvf.topK(emb, q, k = 5, nprobe = nlist), 0, 2)),
      ("pq_default", () => topSets(
        operators.PqAnn.topK(emb, q, k = 5), 0, 1)),
      ("pq_sl_n4", () => topSets(
        operators.PqAnn.topK(emb, q, k = 5,
          shortlist = (n / 4).toInt), 0, 1)),
      ("pq_sl_n2", () => topSets(
        operators.PqAnn.topK(emb, q, k = 5,
          shortlist = (n / 2).toInt), 0, 1)),
      ("pq_m16_auto_sl", () => topSets(
        operators.PqAnn.topK(emb, q, k = 5, m = 16), 0, 1)),
      ("ivfpq_default", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5), 0, 1)),
      ("ivfpq_f070", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5, nprobe = frac(0.70)), 0, 1)),
      ("ivfpq_f085", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5, nprobe = frac(0.85)), 0, 1)),
      ("ivfpq_sl_n4", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5,
          shortlist = (n / 4).toInt), 0, 1)),
      ("ivfpq_m16", () => topSets(
        operators.IvfPq.topK(emb, q, k = 5, m = 16), 0, 1)))
    arms.foreach { case (name, run) =>
      val t0 = System.nanoTime()
      val r = recall(run())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[knee] $name%-22s recall@5 = $r%.3f  ($secs%.2f s)")
    }

    // bytes-touched column (VERDICT r18 stretch 7): candidate rows
    // measured under the really-trained quantizers, converted with
    // each tier's own storage widths — see AnnBytesProbe's cost model
    val nq = q.size
    val mAuto = operators.PqAnn.autoM(n)
    val slAuto = operators.AnnBytesProbe.autoShortlist(n)
    Seq(0.45, 0.55, 0.60, 0.75, 1.0).foreach { f =>
      val cand = operators.AnnBytesProbe.ivfCandidates(emb, q, nlist,
        if (f >= 1.0) nlist else frac(f))
      val b = operators.AnnBytesProbe.ivfBytesPerQuery(cand, nq)
      println(f"[knee-bytes] ivf_f$f%.2f     cand/q=${cand / nq}%7d  " +
        f"bytes/q=$b%9d")
    }
    Seq(("pq_auto_sl", slAuto), ("pq_sl_n4", (n / 4).toInt),
      ("pq_sl_n2", (n / 2).toInt)).foreach { case (name, sl) =>
      val b = operators.AnnBytesProbe.pqBytesPerQuery(n, mAuto, sl)
      println(f"[knee-bytes] $name%-12s cand/q=${n - 1}%7d  bytes/q=$b%9d")
    }
    Seq(0.55, 0.70, 0.85).foreach { f =>
      val cand = operators.AnnBytesProbe.ivfpqCandidates(emb, q,
        frac(f), mAuto)
      val b = operators.AnnBytesProbe.ivfpqBytesPerQuery(cand, nq,
        mAuto, slAuto)
      println(f"[knee-bytes] ivfpq_f$f%.2f   cand/q=${cand / nq}%7d  " +
        f"bytes/q=$b%9d")
    }
    spark.stop()
  }
}
