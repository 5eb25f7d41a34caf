package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.aspects

/** X206 — aspect co-mention lift over the ABSA surface (the
  * association-rule lift of X39/q167 applied to the reference's own
  * dashboard domain): for every unordered pair of the 8 ABSA aspects,
  * how often one review mentions BOTH (class ≠ ABSENT on each), the
  * lift against independence
  *   lift = n_ab·N / (n_a·n_b),
  * and the joint-negative count — "reviews complaining about Shipping
  * also complain about Price" is the cross-aspect signal the
  * reference's per-aspect histograms (q22/q23) cannot see, and the
  * one an ops dashboard pages on. Scoring is the frozen deterministic
  * mock (SURVEY §7.4), so the whole pipeline — normalize → 8 codegen
  * predictions → melt → pair join — replays exactly in the oracle.
  *
  * Determinism: counts are exact longs; lift is one fixed double
  * tree over them. A pair never co-mentioned produces no pair-groupBy
  * row and is therefore ABSENT from the output (both engines agree);
  * the inner join to the singles census guarantees n_a, n_b ≥ 1, so
  * the division never degenerates. Pair identity = the PINNED aspect
  * order index (aspect_a before aspect_b in the reference's
  * aspect_cols order).
  *
  * Scale shape: the melt explodes ×8 on the document scan (the q22
  * shape), the pair self-join runs PER DOCUMENT with ≤ 8 rows per
  * side (≤ 28 output pairs per doc — bounded, never corpus²), and
  * two map-side groupBys land on the 28-row pair frame. Scan-bound —
  * and scanned ONCE: the melted `mentions` frame (doc_id, ai, pred —
  * ~8·N longs) is eagerly materialized before the self-join so the
  * 8-wide scorer subtree is not rebuilt under both join sides plus
  * the singles census (the q207/q201 checkpoint precedent; r17 showed
  * the duplicated subtree costing ~26× the single-pass q22 sibling).
  */
object AspectComention {

  /** q240 — 8×8 upper-triangle co-mention census with lift. */
  val q240 = GraftQuery(
    "q240_aspect_comention", {
      (s, d) => {
        val stackExpr = "stack(8, " + aspects.zipWithIndex
          .map { case (a, i) => s"$i, ${a.toLowerCase}_pred" }
          .mkString(", ") + ") AS (ai, pred)"
        val mentions = graft.Checkpoints.eager(
          PipelineQueries.scores(s, d)
            .select(col("doc_id"), expr(stackExpr))
            .filter(col("pred") =!= 0))
        val n = mentions.groupBy(col("ai"))
          .agg(count(lit(1)).as("n_single"))
        val pairs = mentions.as("a")
          .join(mentions.as("b"),
            col("a.doc_id") === col("b.doc_id") &&
              col("a.ai") < col("b.ai"))
          .groupBy(col("a.ai").as("ai"), col("b.ai").as("bi"))
          .agg(count(lit(1)).as("n_both"),
            sum(when(col("a.pred") === 1 && col("b.pred") === 1, 1L)
              .otherwise(0L)).as("n_both_neg"))
        val total = t(s, d, "documents")
          .agg(count(lit(1)).as("n_docs"))
        val names = typedLit(aspects)
        pairs
          .join(n.select(col("ai"), col("n_single").as("n_a")), "ai")
          .join(n.select(col("ai").as("bi"),
            col("n_single").as("n_b")), "bi")
          .join(broadcast(total))
          .select(
            element_at(names, col("ai") + 1).as("aspect_a"),
            element_at(names, col("bi") + 1).as("aspect_b"),
            col("n_a"), col("n_b"), col("n_both"), col("n_both_neg"),
            ((col("n_both") * col("n_docs")).cast("double") /
              (col("n_a") * col("n_b")).cast("double")).as("lift"))
          .orderBy(col("aspect_a"), col("aspect_b"))
      }
    },
    Some {
      val melted = aspects.zipWithIndex.map { case (a, i) =>
        s"SELECT doc_id, $i AS ai, ${a.toLowerCase}_pred AS pred " +
          "FROM scores"
      }.mkString("\n        UNION ALL ")
      val nameCase = (e: String) => "CASE " + aspects.zipWithIndex
        .map { case (a, i) => s"WHEN $e = $i THEN '$a'" }
        .mkString(" ") + " END"
      s"""
      WITH ${PipelineQueries.scoresCte},
      melted AS (
        $melted),
      mentions AS (SELECT doc_id, ai, pred FROM melted WHERE pred != 0),
      singles AS (
        SELECT ai, COUNT(*) AS n_single FROM mentions GROUP BY 1),
      pairs AS (
        SELECT a.ai AS ai, b.ai AS bi, COUNT(*) AS n_both,
               CAST(SUM(CASE WHEN a.pred = 1 AND b.pred = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_both_neg
        FROM mentions a JOIN mentions b
          ON a.doc_id = b.doc_id AND a.ai < b.ai
        GROUP BY 1, 2),
      total AS (SELECT COUNT(*) AS n_docs FROM documents)
      SELECT ${nameCase("pairs.ai")} AS aspect_a,
             ${nameCase("pairs.bi")} AS aspect_b,
             sa.n_single AS n_a, sb.n_single AS n_b,
             n_both, n_both_neg,
             CAST(n_both * n_docs AS DOUBLE)
               / CAST(sa.n_single * sb.n_single AS DOUBLE) AS lift
      FROM pairs
      JOIN singles sa ON sa.ai = pairs.ai
      JOIN singles sb ON sb.ai = pairs.bi
      CROSS JOIN total
      ORDER BY aspect_a, aspect_b
    """
    })

  val all: Seq[GraftQuery] = Seq(q240)
}
