package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X141 — right-to-be-forgotten purge with audit (the GDPR/CCPA
  * erasure workflow every user-data warehouse runs): given a deletion
  * request set, physically REWRITE the table without the requested
  * users' rows and emit the audit row compliance wants — rows before/
  * purged/after, the physically-read-back survivor count, and the
  * PROOF column (surviving rows still belonging to requested users —
  * must be zero). Deletion is an anti-join rewrite, not a filter
  * view: the bytes are gone from the new table (the X110 versioned
  * table is the time-travel-safe variant — old versions age out by
  * retention there).
  *
  * Shape: one anti-join of the fact table against the request set
  * (broadcast — request sets are person-sized, not corpus-sized) and
  * one partitioned rewrite; the audit is two scan-bound counts. At
  * 100 TB this is the standard "erasure compaction" pass over
  * affected partitions only (partition by user-bucket to bound it).
  *
  * Determinism: the request set is a deterministic predicate here
  * (user_id % 13 = 0 — a stand-in for the request table); all outputs
  * exact longs; the physical read-back count makes the hash fail if
  * the rewrite dropped or kept the wrong rows.
  */
object GdprPurge {

  /** q181 — purge events for the requested users, audit the rewrite. */
  val q181 = GraftQuery(
    "q181_gdpr_purge", {
      (s, d) => {
        val ev = t(s, d, "events")
        val requests = ev.select(col("user_id"))
          .filter(col("user_id") % 13 === 0).distinct()
        val survivors = ev.join(broadcast(requests), Seq("user_id"),
          "left_anti")
        val out = java.nio.file.Files
          .createTempDirectory("q181-purged").toString + "/events_purged"
        survivors.write.mode("overwrite").parquet(out)
        val back = s.read.parquet(out)
        val audit = ev.agg(
          count(lit(1)).as("rows_before"),
          sum(when(col("user_id") % 13 === 0, 1L).otherwise(0L))
            .as("rows_purged"),
          countDistinct(when(col("user_id") % 13 === 0,
            col("user_id"))).as("n_users_requested"))
        audit
          .join(broadcast(back.agg(
            count(lit(1)).as("rows_after_physical"),
            sum(when(col("user_id") % 13 === 0, 1L).otherwise(0L))
              .as("requested_remaining"))))
          .select(lit("events").as("table_name"),
            col("rows_before"), col("rows_purged"),
            (col("rows_before") - col("rows_purged")).as("rows_after"),
            col("rows_after_physical"), col("requested_remaining"),
            col("n_users_requested"))
      }
    },
    Some("""
      SELECT 'events' AS table_name,
             (SELECT COUNT(*) FROM events) AS rows_before,
             CAST((SELECT COUNT(*) FROM events WHERE user_id % 13 = 0)
               AS BIGINT) AS rows_purged,
             CAST((SELECT COUNT(*) FROM events)
               - (SELECT COUNT(*) FROM events WHERE user_id % 13 = 0)
               AS BIGINT) AS rows_after,
             CAST((SELECT COUNT(*) FROM events WHERE user_id % 13 <> 0)
               AS BIGINT) AS rows_after_physical,
             CAST(0 AS BIGINT) AS requested_remaining,
             CAST((SELECT COUNT(DISTINCT user_id) FROM events
                   WHERE user_id % 13 = 0) AS BIGINT)
               AS n_users_requested
    """))

  val all: Seq[GraftQuery] = Seq(q181)
}
