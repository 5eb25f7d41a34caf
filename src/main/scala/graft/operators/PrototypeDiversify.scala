package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.VectorFunctions

/** Prototype-based diversification — the second stage of the D4
  * pipeline (Tirumala et al., "D4: Improving LLM Pretraining via
  * Document De-Duplication and Diversification", 2023): after SemDeDup
  * removes embedding-space near-duplicates ([[SemanticDedup]]), cluster
  * the survivors and DROP the points nearest their cluster centroid —
  * the paper's SSL-prototypes rule. The most prototypical members of a
  * cluster are the ones best represented by the rest of it; cutting
  * them keeps the diverse boundary of every semantic region instead of
  * its redundant core. (SemDeDup keeps the far-from-centroid member of
  * a duplicate GROUP for the same reason — this operator applies the
  * rule corpus-wide, not just inside duplicate groups.)
  *
  * Disposition is per vector: cell, centroid distance, prototype rank
  * (1 = most prototypical), and kept = rank > ⌈dropFrac·|cell|⌉. Every
  * non-zero vector appears; zero-norm vectors are excluded explicitly
  * ([[SemanticDedup.prune]]'s contract — no direction, no cluster).
  *
  * Scale shape: the cell assignment is the same map-side
  * nearest-centroid expression SemDeDup/IVF use (centroids broadcast,
  * a few MB at the paper's ~100k clusters); the only shuffle is ONE
  * cell-keyed window over (vec_id, cell, cdist) — longs and doubles,
  * embeddings never cross an exchange; per-cell work is ∝ |cell| log
  * |cell| and cells size with the corpus, so partitions stay bounded.
  * Determinism: cdist uses [[SemanticDedup.dist2]]'s op order (bit-
  * identical to the assignment's minimization and the DuckDB oracle's
  * fold), ranks tie-break on vec_id, and the ⌈dropFrac·n⌉ cut uses a
  * binary-exact fraction so both engines ceil the same value.
  *
  * No reference counterpart (the reference has no dedup at all —
  * SURVEY §2.8 extension, X63).
  */
object PrototypeDiversify {

  /** Per-vector disposition: (id, cell, cdist_r, cell_size, proto_rank,
    * kept). `dropFrac` should be binary-exact (0.25, 0.5, …) so the
    * ceil boundary is cross-engine deterministic.
    */
  def diversify(vectors: DataFrame, centroids: Array[Double], cells: Int,
      dim: Int, dropFrac: Double, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    require(dropFrac >= 0 && dropFrac < 1,
      s"dropFrac must be in [0,1), got $dropFrac")
    val spark = vectors.sparkSession
    val unitized = vectors
      .select(col(id).as("uid"), col(vec).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.sqNorm(col("v"))))
      .filter(col("nrm") > lit(0.0d))
      .withColumn("unit", transform(col("v"), x => x / col("nrm")))
      .withColumn("cell",
        VectorFunctions.nearestCentroidId(col("unit"), centroids, cells, dim))

    val withDist = unitized
      .join(broadcast(
        SemanticDedup.centroidFrame(spark, centroids, cells, dim)), "cell")
      .withColumn("cdist", SemanticDedup.dist2(col("unit"), col("centroid")))
      // project BEFORE the window: only (uid, cell, cdist) shuffles
      .select(col("uid"), col("cell"), col("cdist"))

    val byProto = Window.partitionBy(col("cell"))
      .orderBy(col("cdist"), col("uid"))
    val cellAll = Window.partitionBy(col("cell"))
    withDist
      .withColumn("proto_rank", row_number().over(byProto))
      .withColumn("cell_size", count(lit(1)).over(cellAll))
      .withColumn("kept",
        col("proto_rank") > ceil(lit(dropFrac) * col("cell_size")))
      .select(col("uid").as(id), col("cell"),
        round(col("cdist"), 6).as("cdist_r"), col("cell_size"),
        col("proto_rank"), col("kept"))
      .orderBy(col(id))
  }
}
