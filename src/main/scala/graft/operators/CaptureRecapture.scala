package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X231 — capture–recapture corpus-size estimation (Lincoln 1930 /
  * Petersen 1896; Chapman's 1951 bias-corrected form; Seber 1970
  * variance): estimate how many DISTINCT documents exist in the wild
  * from two overlapping crawl snapshots, without ever crawling (or
  * deduplicating) everything — mark-recapture with content identity
  * as the mark. The planning question it answers for a training-data
  * pipeline: "our two crawls overlap m of their n₁/n₂ uniques — how
  * much unseen corpus is left?" — the document-level companion to
  * X220's Chao1 (which asks the same of unseen VOCABULARY, from
  * within-sample frequencies rather than between-sample recapture).
  *
  * Snapshots here: crawl A = doc_id % 3 ≠ 0, crawl B = doc_id % 2 ≠ 0
  * (deterministic overlapping thirds/halves); identity = the q50
  * content fingerprint of the normalized text, so exact re-crawl
  * duplicates collapse to one "individual" (stated: near-dups do
  * not — that estimator would compose X15's LSH as the mark instead).
  *
  * Determinism: membership flags, distinct-fingerprint counts, and
  * Chapman's N̂ = (n₁+1)(n₂+1)/(m+1) − 1 are exact integer arithmetic
  * up to ONE double division; Seber's variance is one fixed double
  * tree (products in doubles — corpus-scale long³ would overflow
  * ANSI int64 where DuckDB promotes). m = 0 stays defined (the +1
  * denominators are Chapman's whole point). Rounded at 4 dp.
  *
  * Scale shape: one scan → one |distinct fingerprints| groupBy
  * carrying two boolean flags → a 1-row fold. The fingerprint frame
  * is the same cardinality exact dedup (q40) already pays.
  */
object CaptureRecapture {

  /** q263 — Chapman estimate of distinct-document population from two
    * overlapping snapshot crawls.
    */
  val q263 = GraftQuery(
    "q263_capture_recapture", {
      (s, d) => {
        val marks = t(s, d, "documents")
          .select(col("doc_id"),
            graft.functions.expressions.WordFingerprint(
              split(normalize(col("text")), " ")).as("fp"))
          .groupBy(col("fp"))
          .agg(max(when(pmod(col("doc_id"), lit(3L)) =!= 0L, 1L)
            .otherwise(0L)).as("in_a"),
            max(when(pmod(col("doc_id"), lit(2L)) =!= 0L, 1L)
              .otherwise(0L)).as("in_b"))
        marks.agg(
            count(lit(1)).as("n_true"),
            sum(col("in_a")).as("n1"),
            sum(col("in_b")).as("n2"),
            sum(col("in_a") * col("in_b")).as("m"))
          .withColumn("n_hat",
            (col("n1") + 1L).cast("double") *
              (col("n2") + 1L).cast("double") /
              (col("m") + 1L).cast("double") - 1.0d)
          .withColumn("var_hat",
            (col("n1") + 1L).cast("double") *
              (col("n2") + 1L).cast("double") *
              (col("n1") - col("m")).cast("double") *
              (col("n2") - col("m")).cast("double") /
              ((col("m") + 1L).cast("double") *
                (col("m") + 1L).cast("double") *
                (col("m") + 2L).cast("double")))
          .select(col("n1"), col("n2"), col("m"), col("n_true"),
            round(col("n_hat"), 4).as("n_hat_r"),
            round(col("n_hat") - lit(1.959964d) * sqrt(col("var_hat")),
              4).as("ci_lo"),
            round(col("n_hat") + lit(1.959964d) * sqrt(col("var_hat")),
              4).as("ci_hi"))
      }
    },
    Some(s"""
      WITH marks AS (
        SELECT ${TextFeatures.fingerprintSql(
      normalizeSql("text"))} AS fp,
               MAX(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS in_b
        FROM documents GROUP BY 1),
      folded AS (
        SELECT COUNT(*) AS n_true,
               CAST(SUM(in_a) AS BIGINT) AS n1,
               CAST(SUM(in_b) AS BIGINT) AS n2,
               CAST(SUM(in_a * in_b) AS BIGINT) AS m
        FROM marks),
      stats AS (
        SELECT n1, n2, m, n_true,
               CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                 / CAST(m + 1 AS DOUBLE) - 1.0 AS n_hat,
               CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                 * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
                 / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
                    * CAST(m + 2 AS DOUBLE)) AS var_hat
        FROM folded)
      SELECT n1, n2, m, n_true,
             round(n_hat, 4) AS n_hat_r,
             round(n_hat - 1.959964 * sqrt(var_hat), 4) AS ci_lo,
             round(n_hat + 1.959964 * sqrt(var_hat), 4) AS ci_hi
      FROM stats
    """))

  val all: Seq[GraftQuery] = Seq(q263)
}
