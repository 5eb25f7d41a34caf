package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.VectorFunctions

/** Measured bytes-touched per query for the ANN knee table (VERDICT
  * r18 stretch 7): the knee constants were chosen on recall + probed
  * FRACTION; this measures the actual cost axis — candidate rows under
  * the really-trained quantizer on the real corpus, converted to bytes
  * with each tier's storage widths (float64 vectors = dim·8 B, PQ codes
  * = m B). Lives in the test tree (same package as the operators so it
  * can reuse `IvfPq.buildIndex`) — a profiling harness, not library
  * surface.
  *
  * Cost model per query (the widths are the tiers' own storage):
  *   - ivf:   candRows · dim·8            (exact cosine on every probed row)
  *   - pq:    (N−1) · m  +  shortlist · dim·8   (full ADC code scan + re-rank)
  *   - ivfpq: candRows · m  +  min(shortlist, candRows) · dim·8
  */
object AnnBytesProbe {

  val Dim = 64

  /** Re-export for the (package graft) harness. */
  def autoShortlist(n: Long): Int = PqAnn.autoShortlist(n)

  private def vecsOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))

  /** nprobe nearest cells per query under `coarse`, driver-side (the
    * adcCandidates selection, replicated on public state).
    */
  private def probeFrame(vecs: DataFrame, queryIds: Seq[Long],
      coarse: Array[Array[Double]], nprobe: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val qRows = vecs.filter(col("vec_id").isin(queryIds: _*)).collect()
    qRows.flatMap { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Double](1).toArray
      coarse.indices.sortBy { c =>
        var d = 0d; var i = 0
        while (i < Dim) { val f = q(i) - coarse(c)(i); d += f * f; i += 1 }
        (d, c)
      }.take(nprobe).map(c => (qid, c))
    }.toSeq.toDF("qid", "cell")
  }

  /** Probed candidate rows for an IVF arm (same trainer + assignment
    * expression as AnnIvf.topK).
    */
  def ivfCandidates(emb: DataFrame, queryIds: Seq[Long],
      nlist: Int, nprobe: Int): Long = {
    val vecs = vecsOf(emb)
    val coarse = AnnIvf.trainCentroids(vecs, nlist, Dim)
    val withCell = vecs.withColumn("cell",
      VectorFunctions.nearestCentroidId(col("emb"), coarse.flatten,
        coarse.length, Dim))
    withCell.join(broadcast(probeFrame(vecs, queryIds, coarse, nprobe)),
        "cell")
      .filter(col("vec_id") =!= col("qid"))
      .count()
  }

  /** Probed code rows for an IVFADC arm, under ITS index (residual
    * codebooks ride the same coarse model).
    */
  def ivfpqCandidates(emb: DataFrame, queryIds: Seq[Long],
      nprobe: Int, m: Int): Long = {
    val vecs = vecsOf(emb)
    val idx = IvfPq.buildIndex(vecs, Dim, m = m)
    idx.codes
      .join(broadcast(probeFrame(vecs, queryIds, idx.coarse, nprobe)),
        "cell")
      .filter(col("vec_id") =!= col("qid"))
      .count()
  }

  def ivfBytesPerQuery(candRows: Long, nQueries: Int): Long =
    candRows / nQueries * (Dim * 8L)

  def pqBytesPerQuery(n: Long, m: Int, shortlist: Int): Long =
    (n - 1) * m + shortlist.toLong * (Dim * 8L)

  def ivfpqBytesPerQuery(candRows: Long, nQueries: Int, m: Int,
      shortlist: Int): Long = {
    val perQ = candRows / nQueries
    perQ * m + math.min(shortlist.toLong, perQ) * (Dim * 8L)
  }
}
