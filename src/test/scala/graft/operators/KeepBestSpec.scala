package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q81 — keep-best-quality dedup canonicalization. Structural oracle on
  * sf0.001 (the DuckDB hash oracle covers value-exactness at sf0.01):
  * exactly one kept doc per cluster, and the kept doc attains the
  * cluster's maximum quality with the lowest doc_id among maxima.
  */
class KeepBestSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("exactly one survivor per cluster, and it is the best-quality member") {
    val out = DedupQueries.q81.build(spark, dir).cache()
    try {
      assert(out.count() > 0, "planted corpus must contain near-dup clusters")

      val keptPerCluster = out.groupBy("cluster_id")
        .agg(sum(when(col("is_kept"), 1).otherwise(0)).as("n_kept"))
        .filter(col("n_kept") =!= 1)
      assert(keptPerCluster.isEmpty, "every cluster keeps exactly one doc")

      val best = out
        .join(out.groupBy("cluster_id").agg(max("quality").as("max_q")),
          "cluster_id")
        .filter(col("quality") === col("max_q"))
        .groupBy("cluster_id").agg(min("doc_id").as("best_id"))
      val wrong = out.filter(col("is_kept"))
        .join(best, "cluster_id")
        .filter(col("doc_id") =!= col("best_id"))
      assert(wrong.isEmpty,
        "the kept doc must be the lowest-id maximum-quality member")
    } finally out.unpersist()
  }

  test("cluster membership matches q68's closure (same pair source)") {
    val best = DedupQueries.q81.build(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val canon = DedupQueries.q68.build(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    assert(best.exceptAll(canon).isEmpty && canon.exceptAll(best).isEmpty,
      "q81 and q68 must agree on the clustering itself")
  }
}
