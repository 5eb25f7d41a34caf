package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X153 — small-file compaction planning by offset binning: group a
  * landed table's many small files into target-sized rewrite groups —
  * the maintenance pass every long-lived warehouse runs (the
  * "small-file problem": a 100 TB table ingested in 10k-row batches
  * ends up as millions of KB-scale files whose per-file open/footer
  * cost dominates scans; table formats ship exactly this operation as
  * OPTIMIZE/rewrite_data_files).
  *
  * Formulation: within each source, files in (deterministic) layout
  * order are assigned bin = floor(start_offset / target) where
  * start_offset is the running byte sum of all PRECEDING files — the
  * same offset-split discipline Spark's own FileSourceScanExec uses to
  * pack small files into read splits (`maxPartitionBytes` /
  * `openCostInBytes`). TRUE next-fit ("close the bin when the next
  * file would overflow") is an inherently sequential fold with no
  * prefix-sum closed form — offset binning is its distributed
  * stand-in, overflowing a bin by at most one file; files LARGER than
  * the target land in one bin and are flagged oversize (they need a
  * split rewrite, not a merge — the audit column an operator run
  * reports back). The "files" here are the document rows (doc_id →
  * layout order, n_chars → bytes): the real deployment swaps in the
  * file manifest; the plan is identical.
  *
  * Determinism: byte sums, offsets, and bin ids are exact longs; the
  * per-bin fill ratio is rendered in integer micro-units (bytes·10⁶
  * div target). Output = |bins| rows ≈ total bytes / target.
  *
  * Scale shape: one source-partitioned prefix window (local sorts on
  * the MANIFEST frame — rows are (id, long) pairs, never content) and
  * one map-side-combined groupBy to the bin frame. A single 100 TB
  * source takes the q149 two-level prefix swap.
  */
object CompactionPlanner {

  /** Target compacted size in bytes (n_chars units here). */
  val TargetBytes = 65536L

  /** q194 — per-source compaction plan over the documents manifest. */
  val q194 = GraftQuery(
    "q194_compaction_plan", {
      (s, d) => {
        val wPre = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars").as("bytes"))
          .withColumn("off",
            coalesce(sum(col("bytes")).over(wPre), lit(0L)))
          .withColumn("bin", expr(s"off div $TargetBytes"))
          .groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_files"),
            sum(col("bytes")).as("bytes"),
            min(col("doc_id")).as("first_file"),
            max(col("doc_id")).as("last_file"),
            sum(when(col("bytes") > TargetBytes, 1L).otherwise(0L))
              .as("n_oversize"))
          .withColumn("fill_micro",
            expr(s"bytes * 1000000 div $TargetBytes"))
          .orderBy(col("source"), col("bin"))
      }
    },
    Some(s"""
      WITH manifest AS (
        SELECT source, doc_id, n_chars AS bytes FROM documents),
      off AS (
        SELECT source, doc_id, bytes,
               COALESCE(SUM(bytes) OVER (PARTITION BY source
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS off
        FROM manifest)
      SELECT source, CAST(off // $TargetBytes AS BIGINT) AS bin,
             COUNT(*) AS n_files,
             CAST(SUM(bytes) AS BIGINT) AS bytes,
             MIN(doc_id) AS first_file,
             MAX(doc_id) AS last_file,
             CAST(SUM(CASE WHEN bytes > $TargetBytes THEN 1 ELSE 0 END)
               AS BIGINT) AS n_oversize,
             CAST(SUM(bytes) * 1000000 // $TargetBytes AS BIGINT)
               AS fill_micro
      FROM off
      GROUP BY 1, 2
      ORDER BY source, bin
    """))

  val all: Seq[GraftQuery] = Seq(q194)
}
