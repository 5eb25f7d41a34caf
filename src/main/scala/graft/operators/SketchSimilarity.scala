package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LSH-bucketed approximate nearest neighbors (north-star X16 scale path).
  *
  * Random-hyperplane (sign) LSH: each of L tables hashes a vector to a
  * `bits`-bit bucket by the signs of `bits` fixed random projections.
  * Candidates = corpus rows sharing any table bucket with a query; exact
  * cosine is computed only on candidates.
  *
  * At 100 TB: buckets partition the corpus, each query touches L buckets
  * instead of the full scan; the plane matrix is a literal broadcast into
  * codegen (no per-row allocation beyond the fold).
  */
object AnnLsh {

  /** Deterministic flat plane matrix (t-major), N(0,1), seeded. */
  private def planes(tables: Int, bits: Int, dim: Int): Array[Double] = {
    val rnd = new java.util.Random(4242)
    Array.fill(tables * bits * dim)(rnd.nextGaussian())
  }

  private def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorFunctions.dot(a, b)

  /** (vec_id, table, bucket) rows for every vector. All table buckets are
    * computed by one fused [[graft.functions.expressions.SignLshBuckets]]
    * pass (the plane matrix rides along as a single reference object, not
    * tables×bits×dim literal plan nodes) and unpacked with posexplode.
    */
  def buckets(vecs: DataFrame, tables: Int, bits: Int, dim: Int): DataFrame = {
    val all = graft.functions.expressions.VectorFunctions
      .signLshBuckets(col("emb"), planes(tables, bits, dim), tables, bits, dim)
    vecs.select(col("vec_id"), col("emb"), posexplode(all).as(Seq("table", "bucket")))
  }

  /** Approximate top-k cosine neighbors for the query id set. */
  def topK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      tables: Int = 16, bits: Int = 4): DataFrame = {
    val dim = 64
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm",
        sqrt(graft.functions.expressions.VectorFunctions.sqNorm(col("emb"))))
    val b = buckets(vecs.select("vec_id", "emb"), tables, bits, dim)
    val qb = b.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("table"), col("bucket"))
    val cand = b.join(qb,
        Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
      .distinct()
    // Broadcast ONLY the query vectors: the query side must be filtered
    // to `queryIds` BEFORE the broadcast hint — the hint is honored
    // regardless of size, so broadcasting the unfiltered corpus would
    // collect every embedding to the driver at scale (driver OOM at
    // 100 TB) and only then let the join key discard the non-queries.
    // Same shape as the IVF paths below.
    val queryVecs = vecs.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"),
        col("emb").as("qemb"), col("nrm").as("qnrm"))
    val scored = cand
      .join(vecs.select(col("vec_id"), col("emb"), col("nrm")), "vec_id")
      .join(broadcast(queryVecs), "qid")
      .withColumn("cosine", dot(col("qemb"), col("emb")) /
        (col("qnrm") * col("nrm")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine_r"))
      .orderBy(col("qid"), col("rank"))
  }

  /** ALL pairs with cosine ≥ `minCos` — the embedding member of the
    * near-dup mining family, same candidate discipline as
    * [[MinHashDedup.nearDuplicates]] for text: bucket self-join mines
    * candidates, exact cosine verifies them (precision is exact; recall
    * is the banding probability). Unlike [[topK]] there is no query set:
    * both join sides are the corpus, so NOTHING here is broadcast — the
    * self-join shuffles (table, bucket) keys and the verify join
    * shuffles vec_id, both corpus-partitionable at any scale.
    *
    * Defaults tune for near-DUP thresholds (cosine ≳ 0.8): more bits per
    * bucket than [[topK]] (8 vs 4) keep bucket occupancy — and the
    * candidate set, which grows with the square of occupancy — small,
    * while 16 tables hold the miss probability down (at cos = 0.8,
    * per-table collision ≈ 0.857⁸ ≈ 0.29, so P(miss all 16) < 1%; recall
    * rises steeply above the threshold). Raise `bits` with corpus
    * density, exactly like adding bands in MinHash-LSH.
    */
  def nearPairs(embeddings: DataFrame, minCos: Double,
      tables: Int = 16, bits: Int = 8): DataFrame = {
    val dim = 64
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm",
        sqrt(graft.functions.expressions.VectorFunctions.sqNorm(col("emb"))))
    val b = buckets(vecs.select("vec_id", "emb"), tables, bits, dim)
      .select(col("table"), col("bucket"), col("vec_id"))
    val cand = b.select(col("table"), col("bucket"), col("vec_id").as("ia"))
      .join(b.select(col("table"), col("bucket"), col("vec_id").as("ib")),
        Seq("table", "bucket"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"))
      .distinct()
    cand
      .join(vecs.select(col("vec_id").as("ia"), col("emb").as("ea"),
        col("nrm").as("na")), "ia")
      .join(vecs.select(col("vec_id").as("ib"), col("emb").as("eb"),
        col("nrm").as("nb")), "ib")
      .withColumn("cosine", dot(col("ea"), col("eb")) /
        (col("na") * col("nb")))
      .filter(col("cosine") >= minCos)
      .select(col("ia"), col("ib"), round(col("cosine"), 6).as("cosine_r"))
      .orderBy(col("ia"), col("ib"))
  }
}

/** IVF (inverted-file) approximate nearest neighbors — the second scale
  * path alongside sign-LSH. The corpus is partitioned into `nlist` cells
  * around centroids (deterministic seeded k-means, few iterations —
  * trained once, reused for all queries); a query probes only its
  * `nprobe` closest cells.
  *
  * At 100 TB: centroids are a driver-side model of nlist×dim doubles
  * (broadcast); the corpus is written partitioned by cell id, so a query
  * touches nprobe partitions instead of a full scan — the classic IVF
  * trade of recall for a nlist/nprobe-factor read reduction.
  */
object AnnIvf {

  import graft.functions.expressions.VectorFunctions

  /** Production cell-count rule (the [[PqAnn.autoShortlist]] precedent
    * applied to the coarse quantizer): nlist ≈ √N, floored at 16 (below
    * ~256 vectors finer cells just starve the Lloyd trainer) and capped
    * at 4096 (the driver-side model stays nlist×dim ≤ 2 MB of doubles).
    * The r11 decade probe measured WHY a flat nlist decays: 16 cells ×
    * fixed nprobe lose cell coverage as occupancy grows (recall
    * 0.86 → 0.62 at 10× with nprobe 6). √N cells restore the two knobs
    * production IVF turns: centroid-model cost stays O(√N·dim), and
    * recall at a FIXED probe fraction rises with cell granularity —
    * which is what lets the fraction (the per-query read) be scheduled
    * DOWN as the corpus grows instead of up.
    */
  def autoNlist(n: Long): Int = {
    val r = math.round(math.sqrt(n.toDouble))
    // below ~32 cells the √N regime is strictly worse than the flat
    // small-corpus default: at N=500 the sweep measured 22 cells /
    // 10 probes at 0.78-0.82 recall@5 vs 16/8's 0.86-0.88 — fine cells
    // over a tiny corpus just fragment each query's true-neighbor mass
    // across more cell boundaries without buying any read reduction
    if (r < 32L) 16 else math.min(4096L, r).toInt
  }

  /** Probe count as a constant fraction of the cell count (floor 8 —
    * the measured small-corpus minimum). A constant cell fraction is a
    * constant fraction of the corpus per query — the honest cost — but
    * at √N cells that fraction buys strictly more recall than the same
    * fraction of 16 flat cells (finer cells waste less of the read on
    * far geometry), so holding recall ≥ 0.8 needs no upward schedule.
    * The fraction is chosen from the measured sweeps in SCALE.md: it
    * must clear recall@5 ≥ 0.8 at both decade scales. r18
    * (ProfileAnnKnee, VERDICT r17 item 6): at sf0.1 the fraction curve
    * reads 0.45 → 0.84, 0.55 → 0.90, 0.75 → 0.96, 1.0 → 1.00 recall@5
    * — the 0.84 plateau was the FRACTION binding, not the tier's
    * ceiling. Default moved 0.45 → 0.55 (+10 pts recall for +22 %
    * probed read); recall is monotone in the fraction, so the decade
    * guarantee can only tighten. 0.55 is the chosen knee — past it the
    * next +6 pts cost another +36 % of the corpus per query.
    */
  def autoNprobe(nlist: Int, fraction: Double = 0.55): Int =
    math.max(8, math.min(nlist, math.ceil(nlist * fraction).toInt))

  /** Deterministic coarse-quantizer training: multi-restart maximin
    * (farthest-point, the deterministic k-means++ variant) init + local
    * Lloyd on a hash-spread sample, winner chosen by lowest sample
    * distortion, then `iterations` DISTRIBUTED integer-exact Lloyd
    * passes over the full corpus ([[KMeans.refineCentroids]], X65) when
    * the sample cap bound. Lloyd is init-sensitive — single-init recall
    * on the bench corpus ranged 0.64-0.86 over eight deterministic
    * seeds — and within-cluster distortion is the model-selection
    * criterion that needs no labels, so best-of-R restarts is the
    * standard fix (measured: lifts recall@5 from ~0.6 to 0.80-0.86
    * across all three SFs; the default probe is 8/16 since the r11
    * decade probe measured 6/16 decaying to 0.62 on the 10× corpus —
    * 8/16 holds 0.88/0.82 at sf0.1/10× while still halving the
    * candidate read). The sample stage costs one
    * bounded collect plus driver flops on ≤ sampleCap×dim doubles; the
    * distributed stage is what survives 100 TB — each refine pass shows
    * the quantizer the vectors the sample could not, one map-side
    * kernel assignment + combiner-bounded groupBy per pass, no driver
    * state beyond the nlist×dim model.
    */
  def trainCentroids(vecs: DataFrame, nlist: Int, dim: Int,
      iterations: Int = 3, sampleCap: Int = 4096,
      restarts: Int = 8): Array[Array[Double]] = {
    val sample = vecs
      .orderBy(pmod(col("vec_id") * 2654435761L + 7, lit(sampleCap * 4)),
        col("vec_id"))
      .limit(sampleCap)
      .select(col("emb")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "AnnIvf.trainCentroids: empty training sample")
    // A sample smaller than nlist would leave duplicate init picks
    // (degenerate cells) — clamp instead.
    val cells = math.min(nlist, sample.length)

    // maximin init from a given first pick: each next centroid is the
    // sample point farthest from its nearest chosen one (ties → lowest
    // sample index). Deterministic, spread-guaranteeing.
    def maximinInit(first: Int): Array[Array[Double]] = {
      val picked = new Array[Int](cells)
      picked(0) = first
      val d2near = Array.fill(sample.length)(Double.MaxValue)
      var p = 1
      while (p < cells) {
        val prev = sample(picked(p - 1))
        var best = 0; var bestD = -1d
        var i = 0
        while (i < sample.length) {
          var d = 0d; var j = 0
          while (j < dim) {
            val diff = sample(i)(j) - prev(j); d += diff * diff; j += 1
          }
          if (d < d2near(i)) d2near(i) = d
          if (d2near(i) > bestD) { bestD = d2near(i); best = i }
          i += 1
        }
        picked(p) = best
        p += 1
      }
      picked.map(sample(_).clone())
    }

    // local Lloyd on the sample (empty cells keep their stale centroid,
    // the lenient convention), returning (model, sample distortion)
    def localLloyd(init: Array[Array[Double]],
        iters: Int): (Array[Array[Double]], Double) = {
      var centroids = init
      for (_ <- 0 until iters) {
        val sums = Array.fill(cells)(new Array[Double](dim))
        val counts = new Array[Int](cells)
        sample.foreach { v =>
          val c = nearestCentroid(v, centroids)
          counts(c) += 1
          var i = 0
          while (i < dim) { sums(c)(i) += v(i); i += 1 }
        }
        centroids = Array.tabulate(cells)(c =>
          if (counts(c) == 0) centroids(c)
          else sums(c).map(_ / counts(c)))
      }
      var dist = 0d
      sample.foreach { v =>
        val cs = centroids(nearestCentroid(v, centroids))
        var d = 0d; var i = 0
        while (i < dim) {
          val diff = v(i) - cs(i); d += diff * diff; i += 1
        }
        dist += d
      }
      (centroids, dist)
    }

    // best-of-R restarts by sample distortion; deterministic seed
    // stride, strictly-less keeps the lowest seed on ties. Restarts
    // are independent, so they run on driver THREADS — the local
    // Lloyd is O(R·iters·sample·cells·dim) flops and with the √N cell
    // rule `cells` grows with the corpus, making this the dominant
    // training stage (r12 decade: the IVF time exponent is trainer,
    // not query); the winner pick stays a SEQUENTIAL argmin over the
    // per-restart results, so parallelism cannot change the model
    val nR = math.max(1, restarts)
    // each slot holds Try, not the bare result: an exception inside a
    // restart thread would otherwise go to the default uncaught handler
    // and leave results(r) null, surfacing later as an opaque NPE that
    // masks the real training failure (ADVICE r12)
    val results =
      new Array[scala.util.Try[(Array[Array[Double]], Double)]](nR)
    val threads = (0 until nR).map { r =>
      val t = new Thread(() => {
        results(r) = scala.util.Try(
          localLloyd(maximinInit((r * 997) % sample.length), 10))
      })
      t.start(); t
    }
    threads.foreach(_.join())
    results.collectFirst { case scala.util.Failure(e) => e }
      .foreach(e => throw new RuntimeException(
        "k-means restart thread failed", e))
    var centroids: Array[Array[Double]] = null
    var bestDist = Double.MaxValue
    results.map(_.get).foreach { case (m, d) =>
      if (d < bestDist) { bestDist = d; centroids = m }
    }
    // Distributed refinement over the FULL corpus — integer-exact
    // ([[KMeans.refineCentroids]]), so the trainer stays deterministic
    // under any partitioning. Gated on the sample having been TRUNCATED:
    // `sample.length < sampleCap` means limit() ran off the end of the
    // corpus, the local Lloyd already saw every vector, and a refine
    // pass would re-derive the same model for pure job overhead. At
    // scale the cap always binds and the refine always runs — it is
    // exactly the pass that shows the quantizer the vectors the sample
    // could not.
    if (iterations > 0 && sample.length >= sampleCap)
      KMeans.refineCentroids(vecs, centroids, iterations,
        id = "vec_id", vec = "emb")
    else centroids
  }

  private def nearestCentroid(v: Array[Double],
      cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0d; var i = 0
      while (i < v.length) {
        val diff = v(i) - cs(c)(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The nprobe nearest cells per collected query row (vec_id at field
    * 0, emb at field 1) — the single shared implementation of the
    * probe-cell selection (driver-side on the tiny centroid model;
    * deterministic (distance, cell) tiebreak).
    */
  private def nearestCells(rows: Array[org.apache.spark.sql.Row],
      centroids: Array[Array[Double]], nprobe: Int)
      : IndexedSeq[(Long, Int)] =
    rows.flatMap { r =>
      val qid = r.getLong(0)
      val v = r.getSeq[Double](1).toArray
      centroids.indices
        .sortBy { c =>
          var d = 0d; var i = 0
          while (i < v.length) {
            val diff = v(i) - centroids(c)(i); d += diff * diff; i += 1
          }
          (d, c)
        }
        .take(nprobe).map(c => (qid, c))
    }.toIndexedSeq

  /** Cell assignment as a Column: fused squared-L2 argmin over the flat
    * centroid matrix ([[graft.functions.expressions.NearestCentroidId]]) —
    * one reference object + three loops instead of an nlist-wide tree of
    * dim-element array literals (which made analysis/AQE walks the
    * dominant query cost).
    */
  private def cellOf(emb: org.apache.spark.sql.Column,
      centroids: Array[Array[Double]]): org.apache.spark.sql.Column =
    VectorFunctions.nearestCentroidId(emb, centroids.flatten,
      centroids.length, centroids.headOption.map(_.length).getOrElse(0))

  /** Materialize the IVF index: the corpus written hive-partitioned by
    * cell id ([[graft.sources.Warehouse]] layout). Returns the centroid
    * model to keep alongside the index. This is the at-scale form of the
    * in-memory `topK` path: a probe then READS only nprobe directories
    * (asserted structurally in SketchSpec) instead of scanning the
    * corpus — the nlist/nprobe read-reduction made physical.
    */
  def writeIndex(embeddings: DataFrame, path: String,
      nlist: Int = 0): Array[Array[Double]] = {
    val dim = 64
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(VectorFunctions.sqNorm(col("emb"))))
    val nl = if (nlist > 0) nlist else autoNlist(vecs.count())
    val centroids = trainCentroids(vecs.select(col("vec_id"), col("emb")),
      nl, dim)
    // store the int8 form alongside full precision: a two-stage probe's
    // coarse pass reads the ~8× narrower qv column straight off disk
    // instead of re-quantizing the corpus per query
    vecs.withColumn("cell", cellOf(col("emb"), centroids))
      .withColumn("__scale", Quantize.scaleOf(col("emb")))
      .withColumn("qv", Quantize.quantizeWith(col("emb"), col("__scale")))
      .drop("__scale")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    centroids
  }

  /** Shared exact-rerank tail: score candidates (qid, vec_id, emb, nrm,
    * qemb, qnrm) with float64 cosine and keep the top k per query. ONE
    * implementation for all three probe paths so the ranking contract
    * can't drift.
    */
  private def rerank(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand
      .withColumn("cosine", VectorFunctions.dot(col("qemb"), col("emb")) /
        (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine_r"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Top-k over a materialized index: the probed cells arrive as a
    * partition-pruning `isin` filter, so only nprobe directories are
    * opened. Deterministic given the same centroids as the write.
    * Candidates are deduplicated on (qid, vec_id): the streamed append
    * path is at-least-once, so a replayed batch may leave a vector's
    * row twice in its cell directory.
    */
  def topKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Array[Array[Double]], queryIds: Seq[Long], k: Int,
      nprobe: Int = 0): DataFrame = {
    import spark.implicits._
    val np = if (nprobe > 0) nprobe else autoNprobe(centroids.length)
    val idx = spark.read.parquet(path)
    // query vectors: ONE keyed lookup (at scale these come with the
    // request, not a scan) — the collected rows feed BOTH the probe-cell
    // selection and the broadcast query side, so the index is scanned
    // exactly once more (the cell-pruned candidate read) after this
    val qRows = idx.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("emb"), col("nrm")).collect()
    val queryCells = nearestCells(qRows, centroids, np)
    val probes = queryCells.toDF("qid", "cell")
    val probedCells = queryCells.map(_._2).distinct.sorted
    val queries = qRows
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toIndexedSeq.toDF("qid", "qemb", "qnrm")
    val cand = idx
      .filter(col("cell").isin(probedCells: _*)) // directory pruning
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      // at-least-once appends can duplicate an index row; duplicate
      // rows are identical, so any survivor is correct
      .dropDuplicates("qid", "vec_id")
      .join(broadcast(queries), "qid")
    rerank(cand, k)
  }

  /** Incremental index maintenance: a STREAM of new embeddings is
    * cell-assigned with the frozen centroid model and appended to the
    * same hive-partitioned layout [[writeIndex]] produced — the
    * streaming side of the IVF story (new corpus shards become probeable
    * as soon as their micro-batch commits; centroids retrain offline on
    * the reference's promote cadence, not per batch).
    */
  def appendToIndexStream(stream: DataFrame, path: String,
      checkpointDir: String,
      centroids: Array[Array[Double]]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val vecs = stream
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(VectorFunctions.sqNorm(col("emb"))))
      .withColumn("cell", cellOf(col("emb"), centroids))
      .withColumn("__scale", Quantize.scaleOf(col("emb")))
      .withColumn("qv", Quantize.quantizeWith(col("emb"), col("__scale")))
      .drop("__scale") // match writeIndex's schema
    // foreachBatch batch-append, NOT the streaming file sink: the file
    // sink's _spark_metadata log would shadow the batch-written index
    // files on read (a mixed batch+stream directory is only readable if
    // every writer uses plain parquet commits). At-least-once on batch
    // replay — acceptable for an index (duplicate neighbors dedup at
    // query time by vec_id rank ordering).
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("cell").parquet(path)
      }
  }

  /** Two-stage probe: a QUANTIZED coarse pass scores every candidate in
    * the probed cells on int8 components (reading ~1/8 of the bytes a
    * float64 pass reads), keeps `coarseK` per query via the native
    * [[graft.plans.TopK]] operator, and reranks only those survivors
    * with exact float64 cosine. With `coarseK` ≥ the candidate count the
    * result equals [[topK]] exactly (the coarse pass is purely a
    * filter); smaller `coarseK` trades recall for the 8× narrower
    * coarse read — the standard two-stage ANN pattern at 100 TB, where
    * the int8 column is the only thing the coarse scan touches.
    */
  def topKTwoStage(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nlist: Int = 0, nprobe: Int = 0, coarseK: Int = 64): DataFrame = {
    val session = embeddings.sparkSession
    import session.implicits._
    val dim = 64
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(VectorFunctions.sqNorm(col("emb"))))
      .withColumn("__scale", Quantize.scaleOf(col("emb")))
      .withColumn("qv", Quantize.quantizeWith(col("emb"), col("__scale")))
      .drop("__scale")
    val nl = if (nlist > 0) nlist else autoNlist(vecs.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val centroids = trainCentroids(vecs.select(col("vec_id"), col("emb")),
      nl, dim)
    val withCell = vecs.withColumn("cell", cellOf(col("emb"), centroids))
    // ONE query lookup: the collected rows feed the cell selection and
    // the broadcast query side (the tiny local frame re-derives the
    // quantized form with the same column math — identical values)
    val qRows = withCell.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("emb"), col("nrm")).collect()
    val queryCells = nearestCells(qRows, centroids, np)
    val probes = queryCells.toDF("qid", "cell")
    val queries = qRows
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toIndexedSeq.toDF("qid", "qemb", "qnrm")
      .withColumn("__s", Quantize.scaleOf(col("qemb")))
      .withColumn("qqv", Quantize.quantizeWith(col("qemb"), col("__s")))
      .drop("__s")
    // coarse pass: int8 dot only — no float64 vector is touched here
    val coarse = withCell.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(queries.select(col("qid"), col("qqv"))), "qid")
      .withColumn("score_q", Quantize.dotQ(col("qqv"), col("qv")))
      .select(col("qid"), col("vec_id"), col("score_q"))
    val survivors = graft.plans.TopK.perGroup(coarse,
      Seq(col("qid")), Seq(col("score_q").desc, col("vec_id")), coarseK)
    // exact rerank on the survivors only
    rerank(survivors
      .join(vecs.select(col("vec_id"), col("emb"), col("nrm")), "vec_id")
      .join(broadcast(queries.select(col("qid"), col("qemb"),
        col("qnrm"))), "qid"), k)
  }

  /** Approximate top-k: probe the `nprobe` nearest cells per query.
    * `nlist <= 0` → [[autoNlist]] of the corpus count; `nprobe <= 0` →
    * [[autoNprobe]] of the resolved nlist.
    */
  def topK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nlist: Int = 0, nprobe: Int = 0): DataFrame = {
    val session = embeddings.sparkSession
    import session.implicits._
    val dim = 64
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(VectorFunctions.sqNorm(col("emb"))))
    val nl = if (nlist > 0) nlist else autoNlist(vecs.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val centroids = trainCentroids(vecs.select(col("vec_id"), col("emb")),
      nl, dim)
    val withCell = vecs.withColumn("cell", cellOf(col("emb"), centroids))

    // nprobe closest cells per query, driver-side on the tiny model
    val queryCells = nearestCells(
      withCell.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id"), col("emb")).collect(),
      centroids, np)
    val probes = queryCells.toDF("qid", "cell")

    val queries = withCell.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("nrm").as("qnrm"))
    rerank(withCell.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(queries), "qid"), k)
  }
}
