package graft

/** r16 (VERDICT r15 item 1) — the graph-tier spill EXPERIMENT: the r15
  * SCALE.md adjudication blamed the q168/q175 sf1→sf10 exponents
  * (1.27/1.32) on per-partition sort/checkpoint volume under the 32
  * fixed shuffle partitions pinned by GraftSession, and predicted that
  * scaling partitions with the input shrinks the spill. This probe
  * TESTS that prediction: same replica corpora as ProfileSfxRel
  * (reused, never rebuilt here), same queries, shuffle-partition count
  * swept per run. Not part of the library.
  *
  * Run (after ProfileSfxRel has built /tmp/graft-sfx{1,10}-rel):
  *   sbt "Test/runMain graft.ProfileGraphParts"
  * Env: SPARK_GRAFT_GRID=32,128 partition counts (default 32,128,256)
  *      SPARK_GRAFT_DIRS=... corpora (default sfx1-rel,sfx10-rel)
  *      SPARK_GRAFT_ONLY=q168 query subset
  *      SPARK_GRAFT_REPS=1 timings per cell (default 1 — the effect
  *        under test is multi-× spill, far above host noise)
  */
object ProfileGraphParts {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = sys.props("java.io.tmpdir")
    val dirs = sys.env.getOrElse("SPARK_GRAFT_DIRS",
      s"$tmp/graft-sfx1-rel,$tmp/graft-sfx10-rel").split(",").toSeq
    val grid = sys.env.getOrElse("SPARK_GRAFT_GRID", "32,128,256")
      .split(",").map(_.toInt).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val qs = Seq(graft.operators.TriangleCount.q168,
      graft.operators.PageRank.q175)
      .filter(q => only.forall(_.exists(q.name.startsWith)))

    // MODE=init sweeps AQE's initialPartitionNum (coalescing handles
    // small inputs) instead of the fixed shuffle-partition count — the
    // globally shippable form of the same knob
    val mode = sys.env.getOrElse("SPARK_GRAFT_MODE", "fixed")
    // this probe OWNS the partition count — the shipped per-query
    // scaling (operators.GraphScale) must not overwrite the sweep
    spark.conf.set(graft.operators.GraphScale.DisableKey, "true")
    for (dir <- dirs; q <- qs; p <- grid) {
      if (mode == "init")
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          p.toString)
      else spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.build(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[prof] ${q.name} dir=$dir parts=$p: $t%.2f s")
    }
    spark.stop()
  }
}
