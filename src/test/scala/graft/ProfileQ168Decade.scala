package graft

import org.apache.spark.sql.functions._

/** r17 (VERDICT r16 item 2) — finish the GraphScale experiment on its
  * MOTIVATING query: r16 measured the partition rule's sf10 win on
  * q175 only (371.5 → 193.2 s) and extrapolated "~1.0 exponent" to
  * q168, whose last measured sf1→sf10 exponent (1.27, r15) predates
  * the rule. This probe measures q168 at the sf1/sf10 replica corpora
  * with the SHIPPED rule active (q168 calls `GraphScale` itself — no
  * sweep here, the production path end-to-end), plus one fixed-32 arm
  * at sf10 for the A/B the rule must beat. Rebuilds the sfx10 corpus
  * with ProfileSfxRel's exact replication scheme if absent. Not part
  * of the library.
  *
  * Run: sbt "Test/runMain graft.ProfileQ168Decade"
  * Env: SPARK_GRAFT_REPS=1 timings per cell (spill effects are
  *        multi-×, far above host noise — the ProfileGraphParts rule)
  *      SPARK_GRAFT_SKIP32=1 to skip the fixed-32 sf10 arm
  */
object ProfileQ168Decade {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val tmp = sys.props("java.io.tmpdir")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt

    // ProfileSfxRel's replication scheme, verbatim strides: replica r
    // offsets each key family by its own stride so group sizes and
    // join fan-outs stay constant while keys multiply (TPC-H scaling).
    val (kOrd, kPart, kSupp) = (1000000L, 100000L, 100000L)
    def ensure(dst: String, n: Int): Unit = {
      if (new java.io.File(s"$dst/lineitem.parquet/_SUCCESS").exists())
        return
      val base = spark.read.parquet(s"$src/lineitem.parquet")
      (0 until n).map { r =>
        base.withColumn("l_orderkey", col("l_orderkey") + lit(r * kOrd))
          .withColumn("l_partkey", col("l_partkey") + lit(r * kPart))
          .withColumn("l_suppkey", col("l_suppkey") + lit(r * kSupp))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      println(s"[prof] built $dst (${n}x sf0.1 lineitem)")
    }
    val sf1 = s"$tmp/graft-sfx1-rel" // exists from earlier rounds
    val sf10 = s"$tmp/graft-sfx10-q168"
    ensure(sf1, 10)
    ensure(sf10, 100)

    def time(dir: String, label: String): Double = {
      val t = (1 to reps).map { _ =>
        // the bench harness's per-query conf isolation
        spark.conf.set("spark.sql.shuffle.partitions",
          spark.sparkContext.defaultParallelism.toString)
        val t0 = System.nanoTime()
        graft.operators.TriangleCount.q168.build(spark, dir)
          .groupBy().count().collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val parts = spark.conf.get("spark.sql.shuffle.partitions")
      println(f"[prof] q168 $label: $t%.1f s (shuffle partitions " +
        f"after GraphScale: $parts)")
      t
    }

    val t1 = time(sf1, "sf1 (rule active)")
    val t10 = time(sf10, "sf10 (rule active)")
    println(f"[prof] q168 sf1->sf10 ratio ${t10 / t1}%.1fx, " +
      f"exponent ${math.log10(t10 / t1)}%.2f")

    if (!sys.env.get("SPARK_GRAFT_SKIP32").contains("1")) {
      spark.conf.set(graft.operators.GraphScale.DisableKey, "true")
      val t10fixed = time(sf10, "sf10 (fixed 32 parts)")
      println(f"[prof] rule vs fixed-32 at sf10: " +
        f"$t10%.1f s vs $t10fixed%.1f s " +
        f"(${t10fixed / t10}%.2fx)")
    }
    ProfileCleanup(sf10)
    spark.stop()
  }
}
