package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X79 — embedding-space outlier pruning by quantized centroid
  * distance: per class (the `label` column — in production the cluster
  * id or domain bucket), compute the integer-grid centroid and flag
  * the farthest 5 % of vectors as outliers. This is the standard
  * embedding-quality gate of a semantic curation stack (mislabeled /
  * out-of-distribution pruning before contrastive training — e.g. the
  * within-cluster distance cut SemDeDup-style pipelines apply after
  * clustering), the per-class complement of X53's pairwise prune.
  *
  * Determinism: the X65 quantization recipe (q = round(x·10⁴) + 8192,
  * all later arithmetic integer), centroid = floorDiv(Σq, n) per
  * position — FLOOR division spelled out, because Spark `div`
  * truncates toward zero while DuckDB `//` floors, and a component
  * below -0.8192 makes Σq negative (the operator's own spec plants
  * -0.9 vectors; the r10 ADVICE flagged the truncate/floor divergence
  * as a silent hash-break on such inputs) — d² exact longs,
  * outlier cut by exact per-label rank (d² desc, vec_id) against
  * n div 20 — no float anywhere, so the whole query hash-checks.
  *
  * Scale shape: the centroid pass is one map-side-combined
  * groupBy(label, pos) (labels·dim partials per partition — the
  * [[KMeans]] combiner bound); the distance pass joins each vector row
  * against the labels×dim centroid frame (broadcast-sized); the rank
  * is a per-label window over (d², id) longs — embeddings themselves
  * never cross an exchange after the first projection.
  */
object EmbeddingOutliers {

  /** Outlier fraction denominator: flag n div 20 (5 %) per label. */
  val Cut = 20

  /** q130 — per-label centroid-distance outliers on the integer grid. */
  val q130 = GraftQuery(
    "q130_embedding_outliers",
    (s, d) => {
      val dim = 64
      val q = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding").cast("array<double>"),
            x => round(x * 10000.0d).cast("long") + 8192L).as("q"))
      val comp = q.select(col("vec_id"), col("label"),
        posexplode(col("q")).as(Seq("pos", "x")))
      // integer floorDiv(Σx, n): `div` truncates toward zero, so pull
      // the quotient down one when the remainder is nonzero and the sum
      // negative (n = count is always positive) — the same floor
      // semantics KMeans.refineCentroids uses, matching DuckDB `//`
      val cent = comp.groupBy(col("label"), col("pos"))
        .agg(expr("sum(x) div count(1) - (case when sum(x) % count(1) <> 0" +
          " and sum(x) < 0 then 1 else 0 end)").as("c"))
      val d2 = comp.join(cent, Seq("label", "pos"))
        .withColumn("dd", (col("x") - col("c")) * (col("x") - col("c")))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("dd")).as("d2"))
      val n = d2.groupBy(col("label")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("d2").desc, col("vec_id"))
      d2
        .withColumn("rk", row_number().over(w))
        .join(n, "label")
        .withColumn("is_outlier", col("rk") <= expr(s"n div $Cut"))
        .select(col("vec_id"), col("label"), col("d2"),
          col("rk").as("dist_rank"), col("is_outlier"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH qv AS (
        SELECT vec_id, label,
               list_transform(embedding::DOUBLE[],
                 x -> CAST(round(x * 10000) AS BIGINT) + 8192) AS q
        FROM embeddings),
      comp AS (
        SELECT vec_id, label, i AS pos, q[i] AS x
        FROM (SELECT vec_id, label, q,
                     unnest(generate_series(1, 64)) AS i FROM qv)),
      cent AS (
        SELECT label, pos, SUM(x) // COUNT(*) AS c
        FROM comp GROUP BY 1, 2),
      dist AS (
        SELECT comp.vec_id, comp.label,
               CAST(SUM((comp.x - cent.c) * (comp.x - cent.c)) AS BIGINT)
                 AS d2
        FROM comp JOIN cent USING (label, pos)
        GROUP BY 1, 2),
      sized AS (SELECT label, COUNT(*) AS n FROM dist GROUP BY 1),
      ranked AS (
        SELECT vec_id, label, d2,
               CAST(ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY d2 DESC, vec_id) AS INTEGER) AS dist_rank
        FROM dist)
      SELECT r.vec_id, r.label, r.d2, r.dist_rank,
             r.dist_rank <= s.n // $Cut AS is_outlier
      FROM ranked r JOIN sized s USING (label)
      ORDER BY r.vec_id
    """))

  val all: Seq[GraftQuery] = Seq(q130)
}
