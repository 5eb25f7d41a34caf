package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.aspects

/** X211 — aspect negativity drift (X202's Mann–Kendall applied to the
  * ABSA surface — operator COMPOSITION across tiers): per aspect, the
  * per-ingest-bucket negative-mention count series and the MK
  * monotone-trend verdict on it — "is Shipping getting WORSE as the
  * feed progresses", the longitudinal question q240's co-mention
  * matrix and q22's histogram (both timeless censuses) cannot ask.
  * The time axis is the INGEST SEQUENCE: bucket = doc_id div
  * [[BucketDocs]] (documents carry no timestamp; dense ids are the
  * generator's invariant, spec-asserted the q182 way), trailing
  * partial bucket excluded (stated) so every point is an
  * equal-denominator count and MK on counts ≡ MK on rates.
  *
  * The statistic is LITERALLY [[MannKendall.testOn]]/`statSql` — one
  * factored tree, two queries (q237 the volume axis, q244 the
  * quality axis); exactness is inherited. Scale shape: the q21 melt
  * rides the document scan, then everything runs on the
  * |aspects × buckets| dimension frame.
  */
object AspectDrift {

  /** Ingest-bucket width (docs per point). */
  val BucketDocs = 25L

  /** q244 — per-aspect MK trend over bucketed negative counts. */
  val q244 = GraftQuery(
    "q244_aspect_negativity_drift", {
      (s, d) => {
        val stackExpr = "stack(8, " + aspects
          .map(a => s"'$a', ${a.toLowerCase}_pred")
          .mkString(", ") + ") AS (g, pred)"
        val scored = PipelineQueries.scores(s, d)
        // bucket census from the raw table: scores is 1:1 with
        // documents, so the scorer pass isn't needed to count docs.
        // No eager barrier here, deliberately (the q240/X206 contrast):
        // `series` ends in a groupBy, so testOn's self-join sides sit
        // behind an identical Exchange that ReuseExchange collapses —
        // the scorer runs once already, and an r18 A/B (with vs
        // without localCheckpoint, min-of-3 at sf0.1) showed no gain
        // beyond the session noise band, so the barrier would be cost
        // without a recompute to prevent.
        val nFull = t(s, d, "documents").agg(
          expr(s"count(1) div $BucketDocs").as("n_full"))
        val series = scored
          .select(col("doc_id"), expr(stackExpr))
          .withColumn("day", expr(s"doc_id div $BucketDocs"))
          .join(broadcast(nFull))
          .filter(col("day") < col("n_full"))
          .groupBy(col("g"), col("day"))
          .agg(sum(when(col("pred") === 1, 1L).otherwise(0L)).as("x"))
        MannKendall.testOn(series)
          .select(col("g").as("aspect"), col("n_days").as("n_buckets"),
            col("s_stat"), col("var18"), col("z"),
            col("trend_detected"))
          .orderBy(col("aspect"))
      }
    },
    Some {
      val melted = aspects.map { a =>
        s"SELECT doc_id, '$a' AS g, ${a.toLowerCase}_pred AS pred " +
          "FROM scores"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH ${PipelineQueries.scoresCte},
      melted AS (
        $melted),
      n_full AS (
        SELECT COUNT(*) // $BucketDocs AS n_full FROM documents),
      daily AS (
        SELECT g, doc_id // $BucketDocs AS day,
               CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS x
        FROM melted, n_full
        WHERE doc_id // $BucketDocs < n_full
        GROUP BY 1, 2),
      ${MannKendall.statSql("daily")}
      SELECT g AS aspect, n_days AS n_buckets, s_stat, var18, z,
             CASE WHEN var18 > 0 THEN ABS(z) > ${MannKendall.Z975} END
               AS trend_detected
      FROM zs
      ORDER BY aspect
    """
    })

  val all: Seq[GraftQuery] = Seq(q244)
}
