package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X146 — 2-D skyline / Pareto frontier (Börzsönyi, Kossmann &
  * Stocker, "The Skyline Operator", ICDE 2001): the parts no other
  * part dominates on (price ↓, size ↑) — the multi-criteria shortlist
  * query (cheapest-per-capability catalog view; in a curation stack,
  * the quality-vs-cost frontier over candidate sources).
  *
  * The 2-D case collapses to ONE sorted pass (the ICDE paper's
  * sort-based SFS idea): order by price; a part is on the frontier
  * iff its size strictly exceeds the running max size over all
  * STRICTLY cheaper parts (running max over a range window) and it
  * attains the max size within its own price point (equal price +
  * strictly larger size dominates; exact ties don't). No pair join
  * anywhere — the oracle's NOT EXISTS is the O(n²) definition, the
  * plan is O(n log n).
  *
  * Determinism: prices compared in exact deci-units (round(p·10) —
  * the generator's prices carry one decimal; comparing raw doubles
  * would ride on float representation, mirrored in the oracle so the
  * contract is explicit); sizes are ints. Output is the frontier
  * row set — exact.
  *
  * Scale shape (r19 — VERDICT r18 item 1): the strictly-cheaper
  * running max is the q149 two-level swap on the DISTINCT-price
  * frame — range-bucket by price point, per-bucket maxima → a
  * ≤1025-row prefix of bucket maxima, a bucket-PARTITIONED
  * within-prefix max — so no single-partition window touches a frame
  * that grows with |part| (PlanSpec-gated). The distinct-price frame
  * itself is bounded by the PRICE GRID (deci-unit domain), not by
  * |part|; the verdict join back to parts is a semi join AQE
  * broadcasts once the frontier is planner-visibly small.
  */
object Skyline {

  /** q187 — Pareto frontier of part on (retailprice min, size max). */
  val q187 = GraftQuery(
    "q187_skyline", {
      (s, d) => {
        val parts = t(s, d, "part")
          .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
          .withColumn("pi",
            round(col("p_retailprice") * lit(10)).cast("long"))
        // per price point: the max size at that exact price
        val perPi = parts.groupBy(col("pi"))
          .agg(max(col("p_size")).as("ms"))
        // strictly-cheaper running max via the two-level swap: bucket
        // maxima prefix (≤1025 rows) + bucket-partitioned prefix max
        val bucketed = RankSum.withRangeBucket(perPi,
          col("pi").cast("double"))
        val wb = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = bucketed.groupBy(col("bkt"))
          .agg(max(col("ms")).as("bm"))
          .withColumn("offm", max(col("bm")).over(wb))
          .select(col("bkt"), col("offm"))
        val wv = Window.partitionBy(col("bkt")).orderBy(col("pi"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = bucketed.join(broadcast(offsets), "bkt")
          .withColumn("inm", max(col("ms")).over(wv))
          // greatest() skips NULLs: first price point of the first
          // bucket has no cheaper predecessor at all
          .withColumn("mc", greatest(col("offm"), col("inm")))
          .filter(col("mc").isNull || col("ms") > col("mc"))
          .select(col("pi"), col("ms"))
        parts
          .join(frontier, parts("pi") === frontier("pi") &&
            parts("p_size") === frontier("ms"), "left_semi")
          .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
          .orderBy(col("p_partkey"))
      }
    },
    Some("""
      WITH p AS (
        SELECT p_partkey, p_retailprice, p_size,
               CAST(round(p_retailprice * 10) AS BIGINT) AS pi
        FROM part)
      SELECT p.p_partkey, p.p_retailprice, p.p_size
      FROM p
      WHERE NOT EXISTS (
        SELECT 1 FROM p q
        WHERE q.pi <= p.pi AND q.p_size >= p.p_size
          AND (q.pi < p.pi OR q.p_size > p.p_size))
      ORDER BY p.p_partkey
    """))

  val all: Seq[GraftQuery] = Seq(q187)
}
