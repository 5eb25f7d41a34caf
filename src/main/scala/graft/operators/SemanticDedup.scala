package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

import graft.functions.expressions.VectorFunctions

/** Semantic (embedding-space) deduplication, the SemDeDup shape
  * (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", 2023): assign every vector to a
  * coarse centroid CELL, mine near-duplicate pairs ONLY within a cell,
  * transitively close them into semantic groups, and keep one
  * representative per group — the member FARTHEST from its cell
  * centroid (the paper's low-centroid-similarity rule: of a group of
  * semantic duplicates, the most atypical one carries the most
  * marginal information), ties broken by minimum id.
  *
  * Scale shape (the reason this beats q76's global LSH mining when a
  * clustering already exists): the quadratic face is bounded per cell —
  * pair candidates are |cell|², never |corpus|², and the pair join
  * shuffles on `cell`, so sizing `cells` ∝ corpus (the paper uses ~100k
  * clusters for LAION) keeps per-cell work constant as the corpus
  * grows. The cost of that bound is the paper's own approximation:
  * near-duplicates that straddle a cell boundary are NOT mined —
  * asserted as intended semantics in SemanticDedupSpec, not a bug.
  * Closure then moves only (id, comp) longs ([[ConnectedComponents]]),
  * and the keep rule is one per-group window over rows that already
  * carry their centroid distance.
  *
  * No reference counterpart (the reference has no dedup at all —
  * SURVEY §2.8 extension, X53).
  */
object SemanticDedup {

  /** Centroid frame (cell, centroid) from the flattened c-major matrix —
    * a bounded literal (≤ `cells` rows) joined broadcast to recover the
    * distance-to-own-centroid for the keep rule. At paper-scale cell
    * counts (~100k) this frame is a few MB and still broadcastable; past
    * that, join it by `cell` hash instead.
    */
  private[operators] def centroidFrame(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Double], cells: Int, dim: Int): DataFrame = {
    val rows = (0 until cells).map { c =>
      Row(c, centroids.slice(c * dim, (c + 1) * dim).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("cell", IntegerType, nullable = false),
        StructField("centroid",
          ArrayType(DoubleType, containsNull = false), nullable = false))))
  }

  /** Squared L2 distance with the same op order as
    * [[graft.functions.expressions.NearestCentroidId]]'s loop (and the
    * DuckDB oracle's fold): per-slot squared diffs, then one sequential
    * sum — so the value is bit-identical to what the cell assignment
    * minimized.
    */
  private[operators] def dist2(a: Column, b: Column): Column = {
    val diffs = zip_with(a, b, (x, y) => (x - y) * (x - y))
    aggregate(diffs, lit(0.0d), (acc, v) => acc + v)
  }

  /** Per-CLUSTERED-vector disposition: (id, cell, group_id, group_size,
    * cdist_r, kept). Vectors in no semantic group do not appear (they
    * are all trivially kept), mirroring q68's clustered-docs-only
    * output contract. Zero-norm vectors are excluded EXPLICITLY before
    * normalization (cosine is undefined without a direction, so a zero
    * vector cannot be a semantic duplicate of anything) — without the
    * filter they'd become NaN unit vectors that silently fail every
    * minCos comparison, an implicit drop this repo's fail-loud
    * discipline forbids relying on.
    *
    * @param minCos   cosine threshold on UNIT vectors (cosine == dot).
    * @param centroids flattened c-major `cells × dim` matrix; must be
    *                 the matrix cells were assigned with.
    */
  def prune(vectors: DataFrame, centroids: Array[Double], cells: Int,
      dim: Int, minCos: Double, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    // unit-normalize once: cosine degenerates to a dot product, and the
    // cell assignment becomes scale-invariant (a rescaled duplicate
    // lands in the same cell by construction)
    val unitized = vectors
      .select(col(id).as("uid"), col(vec).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.sqNorm(col("v"))))
      // zero vectors have no direction: excluded by contract (scaladoc)
      // rather than left to NaN-never-matches fallthrough
      .filter(col("nrm") > lit(0.0d))
      .withColumn("unit", transform(col("v"), x => x / col("nrm")))
      .withColumn("cell",
        VectorFunctions.nearestCentroidId(col("unit"), centroids, cells, dim))
      .select(col("uid"), col("cell"), col("unit"))

    // eager-checkpointed ONCE (r19 optimization, the q240/census
    // discipline): this frame is consumed three ways — both sides of
    // the cell self-join below and the final keep-rule join back by id
    // — and the self-join's ReusedExchange dedupe does not extend to
    // the id-keyed third consumer, so without the materialization the
    // unitize + nearest-centroid assignment pass (the |corpus| × cells
    // × dim flop face) re-executed per consumer.
    val withDist = graft.Checkpoints.eager(unitized
      .join(broadcast(centroidFrame(spark, centroids, cells, dim)), "cell")
      .withColumn("cdist", dist2(col("unit"), col("centroid")))
      .select(col("uid"), col("cell"), col("unit"), col("cdist")))

    // the cell-bounded quadratic face: both sides shuffle on cell, pair
    // candidates are |cell|² not |corpus|²
    val a = withDist.select(col("cell"), col("uid").as("ia"),
      col("unit").as("ua"))
    val b = withDist.select(col("cell"), col("uid").as("ib"),
      col("unit").as("ub"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("ia") < col("ib"))
      .filter(VectorFunctions.dot(col("ua"), col("ub")) >= minCos)
      .select(col("ia"), col("ib"))

    val comp = ConnectedComponents.labels(pairs, "ia", "ib")
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("group_size"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(col("cdist").desc, col("id"))
    comp.join(sizes, "comp")
      .join(withDist.withColumnRenamed("uid", "id"), "id")
      .withColumn("kept", row_number().over(w) === 1)
      .select(col("id").as(id), col("cell"),
        col("comp").as("group_id"), col("group_size"),
        round(col("cdist"), 6).as("cdist_r"), col("kept"))
      .orderBy(col(id))
  }
}
