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

  /** Deterministic plane components, N(0,1), seeded. */
  private def planes(tables: Int, bits: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val rnd = new java.util.Random(4242)
    Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian())))
  }

  private def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorFunctions.dot(a, b)

  /** (vec_id, table, bucket) rows for every vector. */
  def buckets(vecs: DataFrame, tables: Int, bits: Int, dim: Int): DataFrame = {
    val ps = planes(tables, bits, dim)
    val bucketCols = ps.zipWithIndex.map { case (planeSet, t) =>
      val bucket = planeSet.zipWithIndex.map { case (plane, j) =>
        val planeLit = array(plane.map(lit): _*)
        when(dot(planeLit, col("emb")) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("table"), bucket.as("bucket"))
    }
    vecs.select(col("vec_id"), col("emb"),
      explode(array(bucketCols: _*)).as("tb"))
      .select(col("vec_id"), col("emb"), col("tb.table"), col("tb.bucket"))
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
    val scored = cand
      .join(vecs.select(col("vec_id"), col("emb"), col("nrm")), "vec_id")
      .join(broadcast(vecs.select(col("vec_id").as("qid"),
        col("emb").as("qemb"), col("nrm").as("qnrm"))), "qid")
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
}
