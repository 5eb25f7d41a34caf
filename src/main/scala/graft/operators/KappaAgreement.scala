package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X108 — inter-judge agreement by Cohen's κ (Cohen 1960): the
  * chance-corrected agreement statistic a curation pipeline keeps over
  * its QUALITY JUDGES — two classifiers (two heuristic gates, a
  * heuristic vs an LLM judge, or two LLM-judge prompts) that agree 85%
  * of the time may still be worthless if the base rates make 84%
  * agreement free; κ = (p_o − p_e)/(1 − p_e) is the standard correction
  * and the acceptance gate before a judge's labels become training
  * signal.
  *
  * Determinism: the confusion matrix is exact integer counts from one
  * map-side-combined agg; p_o, p_e, κ are one shared double tree over
  * those integers (products ≤ n² < 2⁵³ — exactly representable), no
  * transcendental anywhere.
  *
  * Scale shape: one corpus pass to the |classes|² confusion frame
  * (bounded planning frame), everything downstream row-local. At
  * 100 TB the judges' label columns come precomputed (model scores);
  * here both raters are the engine's own deterministic gates (a
  * char-mass judge and a token-count judge — correlated but not
  * identical, so the planted-disagreement structure is real).
  */
object KappaAgreement {

  /** q155 — κ between the char-bucket and token-bucket document
    * judges, with the observed/expected agreement split out.
    */
  val q155 = GraftQuery(
    "q155_judge_agreement_kappa", {
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("ra",
            when(col("n_chars") < 200, "low")
              .when(col("n_chars") < 800, "mid").otherwise("high"))
          .withColumn("toks", size(split(col("text"), " ")).cast("long"))
          .withColumn("rb",
            when(col("toks") < 40, "low")
              .when(col("toks") < 160, "mid").otherwise("high"))
        val cm = docs.groupBy(col("ra"), col("rb"))
          .agg(count(lit(1)).as("c"))
        val agg = cm.agg(
          sum(col("c")).as("n"),
          sum(when(col("ra") === col("rb"), col("c")).otherwise(0L))
            .as("agree"))
        // marginals product term: Σ_k rowMarg(k)·colMarg(k)
        val margs = cm.groupBy(col("ra")).agg(sum(col("c")).as("rm"))
          .withColumnRenamed("ra", "k")
          .join(cm.groupBy(col("rb")).agg(sum(col("c")).as("cmm"))
            .withColumnRenamed("rb", "k"), "k")
          .agg(sum(col("rm") * col("cmm")).as("mprod"))
        agg.join(broadcast(margs))
          .withColumn("po", col("agree").cast("double") /
            col("n").cast("double"))
          .withColumn("pe", col("mprod").cast("double") /
            (col("n").cast("double") * col("n").cast("double")))
          .withColumn("kappa",
            (col("po") - col("pe")) / (lit(1.0d) - col("pe")))
          .select(col("n"), col("agree"),
            round(col("po"), 6).as("po_r"), round(col("pe"), 6).as("pe_r"),
            round(col("kappa"), 6).as("kappa_r"))
      }
    },
    Some("""
      WITH rated AS (
        SELECT CASE WHEN n_chars < 200 THEN 'low'
                    WHEN n_chars < 800 THEN 'mid' ELSE 'high' END AS ra,
               CASE WHEN len(string_split(text, ' ')) < 40 THEN 'low'
                    WHEN len(string_split(text, ' ')) < 160 THEN 'mid'
                    ELSE 'high' END AS rb
        FROM documents),
      cm AS (SELECT ra, rb, count(*) AS c FROM rated GROUP BY 1, 2),
      agg AS (
        SELECT sum(c) AS n,
               sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS agree
        FROM cm),
      margs AS (
        SELECT sum(rm * cmm) AS mprod FROM
          (SELECT ra AS k, sum(c) AS rm FROM cm GROUP BY 1) r
          JOIN
          (SELECT rb AS k, sum(c) AS cmm FROM cm GROUP BY 1) cc
          USING (k)),
      fin AS (
        SELECT n, agree,
               CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
               CAST(mprod AS DOUBLE) /
                 (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
        FROM agg, margs)
      SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
             round(po, 6) AS po_r, round(pe, 6) AS pe_r,
             round((po - pe) / (1.0 - pe), 6) AS kappa_r
      FROM fin
    """))

  val all: Seq[GraftQuery] = Seq(q155)
}
