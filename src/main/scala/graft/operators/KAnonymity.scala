package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X119 — k-anonymity audit (Sweeney, IJUFKS 2002): the privacy-risk
  * gate a dataset release runs next to X27's PII scrub — redaction
  * removes DIRECT identifiers, but a row can still be re-identified
  * through its QUASI-identifier combination (nation × segment × ...)
  * if too few rows share it. A table is k-anonymous when every
  * equivalence class (distinct quasi-id tuple) holds ≥ k rows; the
  * audit reports every class with its size, the at-risk verdict, the
  * achieved k (smallest class), and the share of rows at risk.
  *
  * Determinism: class sizes are exact integers; the risk share is the
  * q111 micro-unit recipe (one integer division, half-up); verdicts
  * are integer comparisons.
  *
  * Scale shape: ONE map-side-combined groupBy to the |classes| frame;
  * achieved-k / risk-share aggregate that frame, broadcast back. At
  * 100 TB classes is bounded by the quasi-id domain product, not the
  * corpus.
  */
object KAnonymity {

  /** The audit over `quasi`-identified rows: per equivalence class
    * size + verdict, with achieved k and the at-risk row share.
    */
  def audit(rows: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    val classes = rows
      .groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val overall = classes.agg(
      min(col("class_size")).as("achieved_k"),
      sum(col("class_size")).as("n"),
      sum(when(col("class_size") < k, col("class_size"))
        .otherwise(0L)).as("n_at_risk"))
      .withColumn("risk_share_r",
        expr("cast((2000000 * n_at_risk + n) div (2 * n) as double) " +
          "/ 1000000.0"))
    classes.join(broadcast(overall))
      .select(quasi.map(col) ++ Seq(col("class_size"),
        (col("class_size") < k).as("at_risk"), col("achieved_k"),
        (col("achieved_k") >= k).as(s"k_anonymous"),
        col("risk_share_r")): _*)
      .orderBy(quasi.map(col): _*)
  }

  /** q163 — k=5 audit of customer over (c_nationkey, c_mktsegment). */
  val q163 = GraftQuery(
    "q163_k_anonymity", {
      (s, d) => audit(t(s, d, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 5)
    },
    Some("""
      WITH classes AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
        FROM customer GROUP BY 1, 2),
      overall AS (
        SELECT CAST(MIN(class_size) AS BIGINT) AS achieved_k,
               CAST(SUM(class_size) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN class_size < 5 THEN class_size
                        ELSE 0 END) AS BIGINT) AS n_at_risk
        FROM classes)
      SELECT c.c_nationkey, c.c_mktsegment, c.class_size,
             c.class_size < 5 AS at_risk, o.achieved_k,
             o.achieved_k >= 5 AS k_anonymous,
             CAST((2000000 * o.n_at_risk + o.n) // (2 * o.n) AS DOUBLE)
               / 1000000.0 AS risk_share_r
      FROM classes c CROSS JOIN overall o
      ORDER BY c.c_nationkey, c.c_mktsegment
    """))

  val all: Seq[GraftQuery] = Seq(q163)
}
