package graft

/** Throwaway adjudication harness for the r8 bench swings (VERDICT r8
  * item 2): q56_topk_native 0.33→1.57 s and q76_embedding_near_pairs
  * 0.85→1.45 s on code unchanged since r4-r5, while the two r8
  * BENCH_FULL runs disagreed 90.2 vs 71.8 s total. Hypothesis to
  * separate: (a) real plan regression — reproduces in a fresh session;
  * (b) session-state interference (GC pressure / codegen-cache
  * eviction in the grown 115-query single-JVM run) — fresh-session
  * times match r7, loaded-session times inflate; (c) host noise —
  * neither arm reproduces the artifact number.
  *
  * Protocol (q97 A/B template, SCALE.md r8): interleaved min-of-5 per
  * arm in ONE JVM — FRESH arm first, then a load phase running the
  * suite's heaviest queries (q42, q81, q87, q96, q110) once, then the
  * LOADED arm, interleaved q56/q76 within each arm so drift hits both.
  */
object ProfileSwing {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def once(q: graft.operators.GraftQuery): Double = {
      val t0 = System.nanoTime()
      q.build(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val q56 = graft.operators.AdvancedQueries.q56
    val q76 = graft.operators.SimilarityQueries.q76

    def arm(tag: String): Unit = {
      once(q56); once(q76) // warmup (codegen + JIT) per arm
      val (a, b) = (Array.ofDim[Double](5), Array.ofDim[Double](5))
      for (i <- 0 until 5) { a(i) = once(q56); b(i) = once(q76) }
      println(f"[prof] $tag q56: min=${a.min}%.3f s  runs=${a.map(x => f"$x%.3f").mkString(",")}")
      println(f"[prof] $tag q76: min=${b.min}%.3f s  runs=${b.map(x => f"$x%.3f").mkString(",")}")
    }

    arm("FRESH ")
    // load phase: the five heaviest suite queries, once each — the
    // session state (codegen cache, broadcast cleanup backlog, old-gen
    // occupancy) a mid-suite q56/q76 actually sees
    Seq(graft.operators.DedupQueries.q42,
      graft.operators.DedupQueries.q81,
      graft.operators.TrainPrepQueries.q87,
      graft.operators.TrainPrepQueries.q96,
      graft.operators.DedupQueries.q110).foreach(once)
    arm("LOADED")
    spark.stop()
  }
}
