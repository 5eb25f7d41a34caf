package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

import graft.functions.expressions.VectorFunctions

/** Distributed Lloyd k-means over integer-quantized embeddings (X65) —
  * the LEARNED upgrade for every centroid consumer in the engine: X53's
  * SemDeDup cells, X63's D4 prototypes, and the IVF coarse quantizer all
  * take a flattened `cells × dim` matrix and until now received frozen
  * LCG planes (SURVEY §7.4's frozen-mock precedent). This is the
  * standard web-scale clustering recipe (Lloyd 1982; the coarse
  * quantizer of Jégou et al.'s IVF family, and the ~100k-cluster step
  * SemDeDup/D4 run on LAION): k-means stays the one clustering that is
  * a pure fixed-point of two relational passes, so it is the natural
  * Spark-first formulation.
  *
  * Determinism discipline (the reason this is hash-exact while MLlib's
  * KMeans is not): embeddings are quantized ONCE to non-negative longs
  * (`round(x·10⁴) + 8192` — the X23 exact-quantization recipe), and
  * every Lloyd step is integer arithmetic after that — squared-L2 in
  * scaled-long space (values ≤ 1.3e6, sums ≤ 6.4e13, integer-exact in
  * the kernel's doubles), centroid update `⌊100·Σx / n⌋` as one
  * `Math.floorDiv` (floor for all signs, matching DuckDB `//` even on
  * the negative sums unit-space inputs can produce). No float
  * accumulation anywhere ⇒ the result is independent
  * of partitioning and row order, and a DuckDB oracle replays the whole
  * loop bit-for-bit (q114).
  *
  * Scale shape: per iteration, assignment is ONE map-side fused-loop
  * pass ([[graft.functions.expressions.NearestCentroidId]], broadcast
  * k×dim reference object); the update is ONE map-side-combined
  * `groupBy(cid, pos)` over exploded (cid, pos, long) rows — k·dim
  * partials per partition, the textbook combiner bound. The driver
  * holds only the k×dim planning frame between iterations (the q80/q109
  * planning-frame precedent). Iterations are sequential jobs by nature
  * (Lloyd is a fixed-point loop), same shape as [[ConnectedComponents]].
  *
  * No reference counterpart (the reference has no clustering at all —
  * SURVEY §2.8 extension).
  */
object KMeans {

  /** Quantization scale: 1e4 keeps four decimal places of the unit-ish
    * embedding range — finer than int8 (X23) because centroids average
    * thousands of vectors and would otherwise collapse onto few values.
    */
  val QScale = 10000.0d

  /** Shift keeping quantized RAW-embedding components positive (min
    * observed component ≈ −0.53 → −5300). The centroid update uses
    * `Math.floorDiv`, which equals DuckDB's `//` floor for ALL signs —
    * so correctness no longer depends on this shift: unit-space
    * consumers ([[fitCentroidsUnit]], [[refineCentroids]]) can feed
    * components down to −1.0 (quantizing to −1808 after the shift,
    * hence negative per-(cid,pos) sums) and the two engines still
    * agree. The shift stays because it keeps the common raw-embedding
    * path in small positive longs (friendlier constants to eyeball in
    * dumps) and because the q114 oracle was certified on this grid.
    */
  val Shift = 8192L

  /** Centroid sub-unit precision: centroids live at 100× the quantized
    * grid, so the update keeps two extra digits below one quantization
    * step. Bounds: components ≤ 1.3e6 scaled, squared-diff sums ≤
    * 6.4e13 < 2⁵³ — integer-exact even through the double-typed kernel.
    */
  val CScale = 100L

  /** Quantized frame (vid, q array<long>) — the one float→int boundary. */
  private def quantize(vectors: DataFrame, id: String, vec: String): DataFrame =
    vectors
      .filter(col(vec).isNotNull)
      .select(col(id).as("vid"),
        transform(col(vec).cast("array<double>"),
          x => round(x * QScale).cast("long") + Shift).as("q"))

  /** (cid, carr) frame from the flat c-major long matrix — broadcast to
    * recover the chosen centroid for the exact final distance.
    */
  private def centroidFrame(spark: org.apache.spark.sql.SparkSession,
      c: Array[Long], k: Int, dim: Int): DataFrame = {
    val rows = (0 until k).map { cid =>
      Row(cid, c.slice(cid * dim, (cid + 1) * dim).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("cid", IntegerType, nullable = false),
        StructField("carr",
          ArrayType(org.apache.spark.sql.types.LongType,
            containsNull = false), nullable = false))))
  }

  /** The scaled-long vector as integer-exact doubles for the fused
    * argmin kernel.
    */
  private def scaledDouble(q: Column): Column =
    transform(q, x => (x * CScale).cast("double"))

  /** Nearest-centroid cid under squared L2 in scaled-long space;
    * lowest cid wins ties (kernel contract = the oracle's `ORDER BY d,
    * cid` row_number).
    */
  private def assign(qf: DataFrame, c: Array[Long], k: Int,
      dim: Int): DataFrame =
    qf.withColumn("cid",
      VectorFunctions.nearestCentroidId(scaledDouble(col("q")),
        c.map(_.toDouble), k, dim))

  /** One Lloyd update: per-(cid, pos) long sums and counts, collected
    * as the k×dim planning frame. Strict mode (the q114 oracle
    * contract) fails loudly on an empty cluster — keeping a stale
    * centroid would silently diverge from the oracle's replay; lenient
    * mode (coarse-quantizer consumers) keeps the stale centroid, the
    * standard Lloyd convention when the model only needs to be usable.
    */
  private def recompute(assigned: DataFrame, prev: Array[Long], k: Int,
      dim: Int, iter: Int, strict: Boolean): Array[Long] = {
    val sums = assigned
      .select(col("cid"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
    val seen = sums.map(_.getInt(0)).toSet
    if (strict) require(seen.size == k,
      s"k-means iteration $iter produced empty cluster(s) " +
        s"${(0 until k).filterNot(seen)} — pick a smaller k or other init")
    val c = prev.clone() // empty cells (lenient mode) keep stale values
    sums.foreach { r =>
      c(r.getInt(0) * dim + r.getInt(1)) =
        Math.floorDiv(CScale * r.getLong(2), r.getLong(3))
    }
    c
  }

  /** Fit `iters` Lloyd updates from a deterministic init (the k
    * smallest-id vectors, cid = id rank) and return the flat c-major
    * scaled-long centroid matrix — feed `.map(_.toDouble)` (divided by
    * `CScale · QScale` and unshifted if unit-space centroids are
    * needed) to the IVF/SemDeDup consumers.
    */
  def fitCentroids(vectors: DataFrame, k: Int, iters: Int, dim: Int,
      id: String = "vec_id", vec: String = "embedding"): Array[Long] = {
    // persist the quantized frame across the Lloyd loop: it is the
    // COMPACT form (dim longs per row vs the source's text/embedding
    // payload), and without it every iteration's action re-derives the
    // whole lineage — at 100 TB that is one full corpus re-scan per
    // pass, the difference between an O(iters) and O(1) read plan
    val qf = quantize(vectors, id, vec)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val initRows = qf.orderBy(col("vid")).limit(k).collect()
      require(initRows.length == k,
        s"k-means needs at least k=$k vectors, found ${initRows.length}")
      var c: Array[Long] = initRows.zipWithIndex.flatMap { case (r, _) =>
        r.getSeq[Long](1).map(_ * CScale)
      }.toArray
      var t = 0
      while (t < iters) {
        c = recompute(assign(qf, c, k, dim), c, k, dim, t, strict = true)
        t += 1
      }
      c
    } finally qf.unpersist(blocking = false)
  }

  /** Externally supplied unit-space init → the scaled-long grid (the
    * same mapping [[quantize]] applies to data rows).
    */
  private def quantizeInit(init: Array[Array[Double]]): Array[Long] =
    init.flatMap(_.map(x => (math.round(x * QScale) + Shift) * CScale))

  /** Scaled-long matrix back to unit space — exact to one part in
    * QScale·CScale, far below any coarse-quantizer cell boundary.
    */
  private def toUnit(c: Array[Long], k: Int,
      dim: Int): Array[Array[Double]] =
    Array.tabulate(k)(cid => Array.tabulate(dim)(i =>
      (c(cid * dim + i).toDouble / CScale - Shift) / QScale))

  /** Unit-space flattened (c-major) centroid matrix from a STRICT fit —
    * the learned drop-in for every frozen-plane consumer
    * ([[SemanticDedup.prune]], [[PrototypeDiversify.diversify]] take
    * exactly this shape). Conversion is one exact double op chain per
    * component, so a SQL oracle reproduces it bit-for-bit from the
    * integer centroid replay.
    */
  def fitCentroidsUnit(vectors: DataFrame, k: Int, iters: Int, dim: Int,
      id: String = "vec_id", vec: String = "embedding"): Array[Double] =
    toUnit(fitCentroids(vectors, k, iters, dim, id, vec), k, dim).flatten

  /** Lenient full-corpus refinement for coarse-quantizer consumers
    * (IVF's cell model, [[AnnIvf.trainCentroids]]): `iters` distributed
    * Lloyd updates from a unit-space init, keeping a stale centroid
    * when a cell empties. Same integer-exact arithmetic as
    * [[fitCentroids]], so the result is independent of partitioning and
    * row order — a sampled-init + full-corpus-refine trainer stays
    * deterministic end to end. At 100 TB this is the piece a sampled
    * trainer cannot provide: each pass is one map-side kernel
    * assignment + one combiner-bounded groupBy over the WHOLE corpus,
    * correcting whatever the init sample missed.
    */
  def refineCentroids(vectors: DataFrame, init: Array[Array[Double]],
      iters: Int, id: String = "vec_id", vec: String = "embedding")
      : Array[Array[Double]] = {
    val k = init.length
    val dim = init.head.length
    // same O(1)-read discipline as fitCentroids: one corpus scan total
    val qf = quantize(vectors, id, vec)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var c = quantizeInit(init)
      var t = 0
      while (t < iters) {
        c = recompute(assign(qf, c, k, dim), c, k, dim, t, strict = false)
        t += 1
      }
      toUnit(c, k, dim)
    } finally qf.unpersist(blocking = false)
  }

  /** Full fit + final assignment: (vec_id, cluster, d2) ordered by id,
    * d2 the EXACT squared L2 to the winning centroid in scaled-long
    * units. `iters` recomputes ⇒ `iters + 1` assignment passes.
    */
  def fit(vectors: DataFrame, k: Int, iters: Int, dim: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    val c = fitCentroids(vectors, k, iters, dim, id, vec)
    val d2 = {
      // same per-slot op order as the kernel loop; every interim value
      // integer-exact in double, so the cast back to long is lossless
      val diffs = zip_with(scaledDouble(col("q")), col("carr").cast("array<double>"),
        (x, y) => (x - y) * (x - y))
      aggregate(diffs, lit(0.0d), (acc, v) => acc + v).cast("long")
    }
    assign(quantize(vectors, id, vec), c, k, dim)
      .join(broadcast(centroidFrame(spark, c, k, dim)), "cid")
      .select(col("vid").as(id), col("cid").as("cluster"), d2.as("d2"))
      .orderBy(col(id))
  }
}
