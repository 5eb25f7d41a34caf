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
  * Scale shape: the two windows are global-ordered, which on a
  * dimension-sized frame (|part|) is fine; the 100 TB form is the
  * q149 two-level swap: range-bucket by price, per-bucket running
  * max, then a |buckets|-sized prefix of bucket maxima.
  */
object Skyline {

  /** q187 — Pareto frontier of part on (retailprice min, size max). */
  val q187 = GraftQuery(
    "q187_skyline", {
      (s, d) => {
        val wCheap = Window.orderBy(col("pi"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wSame = Window.partitionBy(col("pi"))
        t(s, d, "part")
          .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
          .withColumn("pi",
            round(col("p_retailprice") * lit(10)).cast("long"))
          .withColumn("mc", max(col("p_size")).over(wCheap))
          .withColumn("ms", max(col("p_size")).over(wSame))
          .filter((col("mc").isNull || col("p_size") > col("mc")) &&
            col("p_size") === col("ms"))
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
