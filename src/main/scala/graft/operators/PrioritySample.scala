package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X145 — weight-proportional priority sampling (Duffield, Lund &
  * Thorup, "Priority Sampling for Estimation of Arbitrary Subset
  * Sums", JACM 2007): draw k documents with inclusion probability
  * increasing in a weight column (here n_chars — "sample long
  * documents more") such that subset sums stay UNBIASEDLY estimable:
  * each item gets priority q_i = w_i / u_i with u_i uniform, the
  * top-k by priority are the sample, τ is the (k+1)-th priority, and
  * ŵ_i = max(w_i, τ) is the per-item estimator (Σ over any subset of
  * the sample unbiasedly estimates that subset's true weight). The
  * curation use: a size-budgeted training mix that still supports
  * honest token-count accounting per slice.
  *
  * Determinism: u_i is the repo's LCG in threshold form (REDUCE
  * BEFORE MULTIPLY — r11 q140's overflow lesson), shifted to [1, 10^6]
  * so the division is total; priorities are ONE shared IEEE division
  * of two exact-in-double integers (identical bits on both engines);
  * ties broken by doc_id. τ is row k+1 under that total order.
  *
  * Scale shape: priorities are a scan-local map; top-(k+1) is a
  * distributed partial top-k (TakeOrderedAndProject — per-partition
  * heads merged on the driver, never a global sort); the τ/ŵ columns
  * are a window over the k+1 surviving rows only.
  */
object PrioritySample {

  val K = 64

  /** q186 — priority-sample 64 documents by n_chars weight. */
  val q186 = GraftQuery(
    "q186_priority_sample", {
      (s, d) => {
        val pri = t(s, d, "documents")
          .select(col("doc_id"), col("n_chars").as("w"))
          .withColumn("u",
            (col("doc_id") % lit(1000003L) * lit(1103515245L)
              + lit(12345L)) % lit(1000000L) + lit(1L))
          .withColumn("priority",
            (col("w") * lit(1000000L)).cast("double")
              / col("u").cast("double"))
        val top = pri
          .orderBy(col("priority").desc, col("doc_id")).limit(K + 1)
        val wOrd = Window.orderBy(col("priority").desc, col("doc_id"))
        val wAll = Window
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        top
          .withColumn("rn", row_number().over(wOrd))
          .withColumn("tau", coalesce(
            max(when(col("rn") === lit(K + 1), col("priority")))
              .over(wAll), lit(0.0d)))
          .filter(col("rn") <= K)
          .select(col("rn").as("rank"), col("doc_id"), col("w"),
            col("u"), col("priority"), col("tau"),
            greatest(col("w").cast("double"), col("tau")).as("w_hat"))
          .orderBy(col("rank"))
      }
    },
    Some(s"""
      WITH pri AS (
        SELECT doc_id, n_chars AS w,
               ((doc_id % 1000003) * 1103515245 + 12345)
                 % 1000000 + 1 AS u
        FROM documents),
      scored AS (
        SELECT doc_id, w, u,
               CAST(w * 1000000 AS DOUBLE) / CAST(u AS DOUBLE)
                 AS priority
        FROM pri),
      ranked AS (
        SELECT doc_id, w, u, priority,
               ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rn
        FROM scored),
      cut AS (SELECT * FROM ranked WHERE rn <= ${K + 1}),
      tau AS (
        SELECT COALESCE(MAX(CASE WHEN rn = ${K + 1} THEN priority END),
               0.0) AS tau
        FROM cut)
      SELECT CAST(rn AS INTEGER) AS rank, doc_id,
             CAST(w AS BIGINT) AS w, CAST(u AS BIGINT) AS u,
             priority, tau.tau AS tau,
             GREATEST(CAST(w AS DOUBLE), tau.tau) AS w_hat
      FROM cut CROSS JOIN tau
      WHERE rn <= $K
      ORDER BY rank
    """))

  val all: Seq[GraftQuery] = Seq(q186)
}
