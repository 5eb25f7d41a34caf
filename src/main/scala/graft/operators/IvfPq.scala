package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

import graft.functions.expressions.VectorFunctions

/** X80 — IVFADC: the composed IVF∘PQ index, the production ANN shape
  * (Jégou et al. TPAMI 2011 §IV). The coarse quantizer ([[AnnIvf]]'s
  * trainer) partitions the corpus into cells; within each cell the
  * vector's RESIDUAL against its cell centroid is PQ-encoded
  * ([[PqAnn]]'s codebooks trained on the residual frame — residuals
  * have most of the coarse structure subtracted out, which is exactly
  * why IVFADC quantizes them instead of raw vectors). A query probes
  * its nprobe nearest cells with a PER-(query, cell) ADC lookup table
  * built from the query's residual against that cell, so the scan
  * touches only probed-cell code rows — nprobe/nlist of the corpus,
  * 4 bytes per vector.
  *
  * Scale shape: this is the first ANN tier where BOTH read-reduction
  * axes compose — cell pruning (rows: nprobe/nlist, physically a
  * partition-pruned directory read in the [[AnnIvf.writeIndex]]
  * layout, which stores by cell already) and code compression
  * (bytes/row: 4 vs 256). The exact re-rank touches |Q|·shortlist
  * float vectors. Driver state is the coarse model + M codebooks +
  * |Q|·nprobe LUTs — kilobytes.
  */
object IvfPq {

  /** Coarse cell count and probe count now follow [[AnnIvf.autoNlist]]
    * (√N cells) and [[AnnIvf.autoNprobe]] (constant cell fraction,
    * floor 8) — the r11 decade probe showed the flat 16-cell regime
    * losing cell coverage as occupancy grows (plain-IVF recall
    * 0.86 → 0.62 at 10× before the nprobe bump), and its own sweep
    * showed √N cells at a fixed probe fraction matching flat-16 recall
    * at 10× while reading a shrinking corpus fraction. Historical
    * measured points at the old flat 16/8: recall@5 0.84 (sf0.1) /
    * 0.78 (10×); the auto rule's decade numbers live in SCALE.md.
    */
  def nListFor(n: Long): Int = AnnIvf.autoNlist(n)

  private def centFrame(spark: org.apache.spark.sql.SparkSession,
      coarse: Array[Array[Double]]): DataFrame = {
    val rows = coarse.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("cell", IntegerType, nullable = false),
        StructField("carr", ArrayType(DoubleType, containsNull = false),
          nullable = false))))
  }

  /** The trained IVFADC index: coarse model, residual codebooks, and
    * the per-vector (vec_id, cell, code) frame. Exposed (package-
    * private) so IvfPqSpec can oracle each stage — both trainers are
    * deterministic, so a spec rebuild reproduces [[topK]]'s exact
    * model.
    */
  private[operators] final case class Index(
      coarse: Array[Array[Double]],
      model: Array[Array[Array[Double]]],
      codes: DataFrame)

  private[operators] def buildIndex(vecs: DataFrame, dim: Int,
      nlist: Int = 0, m: Int = PqAnn.M): Index = {
    val nl = if (nlist > 0) nlist else nListFor(vecs.count())
    val coarse = AnnIvf.trainCentroids(vecs, nl, dim)
    val cells = centFrame(vecs.sparkSession, coarse)
    val withRes = vecs
      .withColumn("cell", VectorFunctions.nearestCentroidId(col("emb"),
        coarse.flatten, coarse.length, dim))
      .join(broadcast(cells), "cell")
      .withColumn("res", zip_with(col("emb"), col("carr"), (x, c) => x - c))
    val model = PqAnn.train(
      withRes.select(col("vec_id"), col("res").as("emb")), m = m)
    Index(coarse, model, withRes.select(col("vec_id"), col("cell"),
      PqAnn.encode(col("res"), model).as("code")))
  }

  /** The residual-ADC candidate stage: probed-cell code rows scored by
    * the per-(query, cell) residual LUT, shortlisted per query. Output
    * keeps `adc_dist` so the spec can check it against an independent
    * driver recomputation; [[topK]] drops it.
    */
  private[operators] def adcCandidates(idx: Index, vecs: DataFrame,
      queryIds: Seq[Long], nprobe: Int, shortlist: Int): DataFrame = {
    import idx.{coarse, model}
    val spark = vecs.sparkSession
    import spark.implicits._
    val dim = coarse(0).length
    // bounded collect: the |Q| query vectors → nprobe cells + one
    // residual LUT per (query, cell)
    val qRows = vecs.filter(col("vec_id").isin(queryIds: _*)).collect()
    val probeLuts = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Double](1).toArray
      coarse.indices.sortBy { c =>
        var d = 0d; var i = 0
        while (i < dim) {
          val diff = q(i) - coarse(c)(i); d += diff * diff; i += 1
        }
        (d, c)
      }.take(nprobe).map { c =>
        val res = Array.tabulate(dim)(i => q(i) - coarse(c)(i))
        (qid, c, PqAnn.lut(res, model))
      }
    }
    val probes = probeLuts.toSeq.toDF("qid", "cell", "lut")

    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist"), col("vec_id"))
    idx.codes
      .join(broadcast(probes), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("adc_dist",
        PqAnn.adcDist(col("code"), col("lut"), idx.model.length))
      .withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= shortlist)
      .select(col("qid"), col("vec_id"), col("cell"), col("adc_dist"))
  }

  /** Top-k by IVFADC: cell-probe → residual-ADC shortlist → exact
    * re-rank. Output: (qid, vec_id, rank, dist) with dist the exact
    * squared L2. `shortlist <= 0` → [[PqAnn.autoShortlist]] (N/8
    * clamped to [64, 1024] — same decay argument as the flat PQ tier;
    * the candidate pool here is only the probed nprobe/nlist fraction,
    * but sizing off full N keeps the two tiers' re-rank budgets
    * comparable and measured 0.86 recall@5 at sf0.1).
    */
  def topK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nprobe: Int = 0, shortlist: Int = 0, m: Int = 0): DataFrame = {
    val dim = 64
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val n = vecs.count()
    val sl = if (shortlist > 0) shortlist else PqAnn.autoShortlist(n)
    // code budget follows the corpus like the cell count does:
    // [[PqAnn.autoM]] — m=8 while the shortlist cap is slack, m=16
    // once it binds (the N=100k residual-ADC decay 0.70 → 0.92)
    val mm = if (m > 0) m else PqAnn.autoM(n)
    val nl = nListFor(n)
    // the composed tier pins its cell fraction at 0.55: the
    // residual-ADC ranking is lossy on top of the cell cut, and the
    // r12 sweep measured 0.45 dipping to 0.78 at sf0.1 while 0.55
    // holds 0.84+/0.82 across the decade — the extra probes cost
    // code-column reads (4 B/vector), not float reads. (Since r18
    // plain IVF's default fraction is also 0.55 — the ProfileAnnKnee
    // sweep; this tier's recall lift there came from the N/4
    // shortlist, 0.84 → 0.88.)
    val np = if (nprobe > 0) nprobe else AnnIvf.autoNprobe(nl, 0.55)
    val idx = buildIndex(vecs, dim, nl, mm)
    val cand = adcCandidates(idx, vecs, queryIds, np, sl)
      .select(col("qid"), col("vec_id"))

    val qVecs = vecs.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    cand
      .join(vecs, "vec_id")
      .join(broadcast(qVecs), "qid")
      .withColumn("dist", aggregate(
        zip_with(col("emb"), col("qemb"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), col("dist"))
      .orderBy(col("qid"), col("rank"))
  }
}
