package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X100 — streaming maintenance of the table profile (X87) and the
  * equi-depth histogram (X99), riding X98's mergeable-state machinery
  * ([[MaterializedAgg.mergeOnceAs]]: rename-away swap, batch marker,
  * crash recovery — all shared, none re-implemented).
  *
  * Both states are associative+commutative, so per-batch maintenance
  * is a sketch-sized merge, never a rescan:
  *
  *   - **Profile state**: one row per column — exact row/null counts,
  *     min/max, and an HLL sketch for distincts (exact countDistinct is
  *     the one X87 column that is NOT mergeable without a rescan; the
  *     sketch is the standard swap, X44/X98 precedent). Built one
  *     single-row agg per column, stacked — the X87 anti-EXPAND
  *     discipline (a wide agg with several countDistincts makes
  *     Catalyst EXPAND the input |columns|-fold).
  *   - **Histogram state**: a FROZEN-GRID count vector — the value
  *     space is cut once into `cells` equal fine cells; each batch
  *     contributes per-cell (count, min, max) rows and merge is an
  *     additive groupBy. Equi-depth boundaries are interpolated from
  *     the merged counts at READ time, so bucket boundaries stay
  *     equi-depth over the whole absorbed stream, not per batch. This
  *     is the mergeable-summary trade: resolution is bounded by the
  *     fine-cell width (state = ≤cells rows, a planning frame), the
  *     GK/KLL swap if sub-cell accuracy is ever needed. Out-of-range
  *     values clamp into the edge cells, whose true min/max are
  *     tracked, so the outermost boundaries stay honest.
  *
  * Exactly-once under replay and mid-swap kills comes entirely from
  * the shared machinery; StreamingProfileSpec proves merged ≡ one-shot
  * under different slicings, boundary accuracy vs the exact
  * percentile, and the replayed-batch no-op.
  */
object StreamingProfile {

  /** Mergeable per-column profile partials for `cols` of `batch`.
    * Numeric min/max ride a try_cast (a non-numeric column profiles to
    * null bounds instead of an ANSI cast error — counts/distinct still
    * apply to it).
    */
  def profilePartials(batch: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      batch.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        hll_sketch_agg(col(c).cast("string"), 12).as("hll"),
        min(expr(s"try_cast(`$c` AS DOUBLE)")).as("mn"),
        max(expr(s"try_cast(`$c` AS DOUBLE)")).as("mx"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("hll"), col("mn"), col("mx"))
    }.reduce(_ unionByName _)

  /** Combine two profile frames (either may be state or delta). */
  def profileCombine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("column_name"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_nulls")).as("n_nulls"),
        hll_union_agg(col("hll"), lit(false)).as("hll"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Merge one batch of the stream into the profile state at `path` —
    * exactly-once by batch id (the X98 contract).
    */
  def mergeProfileOnce(batch: DataFrame, cols: Seq[String], path: String,
      batchId: Long): Unit =
    MaterializedAgg.mergeOnceAs(batch, path, batchId,
      profilePartials(_, cols), profileCombine)

  /** The profile read-back: X87's columns with the distinct estimate
    * and the micro-unit null ratio.
    */
  def readProfile(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    spark.read.parquet(path)
      .withColumn("null_ratio_r",
        expr("cast((2000000 * n_nulls + n_rows) div (2 * n_rows) " +
          "as double) / 1000000.0"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("null_ratio_r"),
        hll_sketch_estimate(col("hll")).as("approx_distinct"),
        col("mn"), col("mx"))
      .orderBy(col("column_name"))
  }

  /** Wire a stream into the profile maintenance loop. */
  def streamProfile(input: DataFrame, cols: Seq[String], path: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeProfileOnce(batch, cols, path, batchId)
      }
      .start()

  // ---- GK-sketch histogram state (unknown bounds, X113) -----------

  /** Mergeable GK-sketch partials of `valueCol`: ONE row of
    * (serialized sketch, exact n) per batch — the unknown-bounds
    * path the frozen grid's scaladoc promises: no [lo, hi) a priori,
    * rank error ≤ ε·n instead of one-cell-width resolution
    * ([[graft.functions.expressions.GkQuantileSketch]]).
    */
  def sketchPartials(batch: DataFrame, valueCol: String,
      eps: Double = graft.functions.expressions.GkQuantileSketch.DefaultEps)
      : DataFrame =
    batch.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .agg(graft.functions.expressions.GkQuantileSketch
        .sketchAgg(col("v"), eps).as("gk"),
        count(lit(1)).as("n"))

  /** Combine two sketch frames — GK merge + exact count addition. */
  def sketchCombine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).agg(
      graft.functions.expressions.GkQuantileSketch
        .mergeAgg(col("gk")).as("gk"),
      sum(col("n")).as("n"))

  /** Merge one batch into the sketch state — exactly-once. */
  def mergeSketchOnce(batch: DataFrame, valueCol: String, path: String,
      batchId: Long,
      eps: Double = graft.functions.expressions.GkQuantileSketch.DefaultEps)
      : Unit =
    MaterializedAgg.mergeOnceAs(batch, path, batchId,
      sketchPartials(_, valueCol, eps), sketchCombine)

  /** Equi-depth boundaries off the merged sketch state: k−1 quantiles
    * queried from the ONE-row state frame — no grid, no bounds, rank
    * error ≤ ε·n per boundary.
    */
  def equiDepthSketch(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int): Seq[Double] = {
    MaterializedAgg.recover(spark, path)
    val row = spark.read.parquet(path).select(col("gk")).head
    graft.functions.expressions.GkQuantileSketch
      .query(row.getAs[Array[Byte]](0),
        (1 until k).map(i => i.toDouble / k)).toSeq
  }

  // ---- frozen-grid histogram state --------------------------------

  /** Fine cells in the frozen grid. Bounded and constant: the state
    * frame and the read-side collect are ≤ this many rows.
    */
  val Cells = 4096

  /** Per-cell (count, min, max) partials of `valueCol` over the frozen
    * grid [lo, hi) — nulls skipped, out-of-range values clamped into
    * the edge cells.
    */
  def gridPartials(batch: DataFrame, valueCol: String, lo: Double,
      hi: Double, cells: Int = Cells): DataFrame = {
    val w = (hi - lo) / cells
    batch.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("cell", least(lit(cells - 1), greatest(lit(0),
        floor((col("v") - lit(lo)) / lit(w)).cast("int"))))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
  }

  /** Combine two grid frames — additive per cell. */
  def gridCombine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("cell"))
      .agg(sum(col("n")).as("n"), min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** GROUPED grid partials: one frozen-grid histogram per key of
    * `groupCol` (the per-segment/per-source form an ingest dashboard
    * keeps — same grid for every group so merged groups stay
    * comparable). State is ≤ |groups|·cells rows; at a large group
    * count the per-group occupancy just gets sparser, never wider.
    */
  def groupedGridPartials(batch: DataFrame, groupCol: String,
      valueCol: String, lo: Double, hi: Double,
      cells: Int = Cells): DataFrame = {
    val w = (hi - lo) / cells
    batch.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
      .withColumn("cell", least(lit(cells - 1), greatest(lit(0),
        floor((col("v") - lit(lo)) / lit(w)).cast("int"))))
      .groupBy(col("g"), col("cell"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
  }

  /** Combine two grouped grid frames — additive per (group, cell). */
  def groupedGridCombine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("g"), col("cell"))
      .agg(sum(col("n")).as("n"), min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Merge one batch into the grouped grid state — exactly-once. */
  def mergeGroupedGridOnce(batch: DataFrame, groupCol: String,
      valueCol: String, lo: Double, hi: Double, path: String,
      batchId: Long, cells: Int = Cells): Unit =
    MaterializedAgg.mergeOnceAs(batch, path, batchId,
      groupedGridPartials(_, groupCol, valueCol, lo, hi, cells),
      groupedGridCombine)

  /** Per-group equi-depth boundaries from the merged grouped state —
    * the cumulative walk runs per group over its ≤cells-row slice (a
    * group-partitioned window over bounded frames, not a collect:
    * |groups| can be large even though each group's frame is small).
    */
  def equiDepthBy(spark: org.apache.spark.sql.SparkSession, path: String,
      k: Int, lo: Double, hi: Double, cells: Int = Cells): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    MaterializedAgg.recover(spark, path)
    val w = (hi - lo) / cells
    val st = spark.read.parquet(path)
    val wg = Window.partitionBy(col("g")).orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wall = Window.partitionBy(col("g"))
    val cum = st
      .withColumn("cumBefore", coalesce(sum(col("n")).over(wg), lit(0L)))
      .withColumn("total", sum(col("n")).over(wall))
    // boundary i of group g sits in the cell where cumBefore+n first
    // reaches i·total/k; interpolate within that cell
    val bounds = cum
      .select(col("g"), col("cell"), col("n"), col("cumBefore"),
        col("total"), explode(sequence(lit(1), lit(k - 1))).as("bi"))
      // integer rank target (div — same floor semantics as the global
      // equiDepth's driver arithmetic)
      .withColumn("target", expr(s"(bi * total) div $k"))
      .filter(col("cumBefore") < col("target") &&
        col("cumBefore") + col("n") >= col("target"))
      .withColumn("need", col("target") - col("cumBefore"))
      .withColumn("bound", lit(lo) + col("cell") * w +
        lit(w) * col("need").cast("double") / col("n").cast("double"))
      .select(col("g"), col("bi"), col("bound"))
    bounds.orderBy(col("g"), col("bi"))
  }

  /** Merge one batch into the grid state — exactly-once by batch id. */
  def mergeGridOnce(batch: DataFrame, valueCol: String, lo: Double,
      hi: Double, path: String, batchId: Long,
      cells: Int = Cells): Unit =
    MaterializedAgg.mergeOnceAs(batch, path, batchId,
      gridPartials(_, valueCol, lo, hi, cells), gridCombine)

  /** Equi-depth boundaries from the merged grid state: k buckets of
    * ~total/k rows each, boundaries linearly interpolated inside the
    * crossing cell (error ≤ one cell width by construction). The
    * collect is the ≤[[Cells]]-row state frame — a bounded planning
    * frame, never the corpus.
    */
  def equiDepth(spark: org.apache.spark.sql.SparkSession, path: String,
      k: Int, lo: Double, hi: Double, cells: Int = Cells): DataFrame = {
    import spark.implicits._
    MaterializedAgg.recover(spark, path)
    val w = (hi - lo) / cells
    val state = spark.read.parquet(path)
      .select(col("cell"), col("n"), col("mn"), col("mx"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val total = state.map(_._2).sum
    // walk the cumulative counts once; boundary i sits where the
    // cumulative crosses i·total/k, interpolated within that cell
    val bounds = new Array[Double](k - 1)
    var cum = 0L
    var bi = 0
    state.foreach { case (cell, n, _, _) =>
      val cellLo = lo + cell * w
      while (bi < k - 1 && cum + n >= (bi + 1).toLong * total / k) {
        val need = (bi + 1).toLong * total / k - cum
        bounds(bi) = cellLo + w * need.toDouble / n
        bi += 1
      }
      cum += n
    }
    val globalLo = state.headOption.map(_._3).getOrElse(lo)
    val globalHi = state.lastOption.map(_._4).getOrElse(hi)
    (1 to k).map { b =>
      val blo = if (b == 1) globalLo else bounds(b - 2)
      val bhi = if (b == k) globalHi else bounds(b - 1)
      (b, blo, bhi)
    }.toDF("bucket", "lo", "hi")
  }
}
