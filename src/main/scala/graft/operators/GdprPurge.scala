package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X141 — right-to-be-forgotten purge with audit (the GDPR/CCPA
  * erasure workflow every user-data warehouse runs): given a deletion
  * request set, physically REWRITE the table without the requested
  * users' rows and emit the audit row compliance wants — rows before/
  * purged/after, the physically-read-back survivor count, and the
  * PROOF column (surviving rows still belonging to requested users —
  * must be zero). Deletion runs THROUGH the X110 versioned table
  * (r16, VERDICT r15 item 4): [[graft.sources.VersionedTable.purge]]
  * commits a new version that rewrites only the affected data files
  * and carries the rest, then [[graft.sources.VersionedTable.vacuum]]
  * is the physical byte-erasure point — so erasure composes with
  * time travel exactly as the format promises (pinned readers keep
  * old versions until retention; VersionedTableSpec proves the
  * pinned-reader-during-purge and post-vacuum read-back cases).
  *
  * Shape: one pruned scan to find affected files, one filter-rewrite
  * of those files only; the audit is two scan-bound counts. At
  * 100 TB this is the standard "erasure compaction" pass over
  * affected files only (partition/z-order by a user key to bound it).
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
        val pred = col("user_id") % 13 === 0
        val root = Scratch.fresh("q181-table") + "/events_versioned"
        // v1 = the landed fact table; v2 = the purge commit (affected
        // files rewritten, untouched files carried); vacuum at v2 =
        // the byte-erasure point. The read-back goes through the
        // committed manifest, so a wrong rewrite breaks the hash.
        graft.sources.VersionedTable.overwrite(ev, root)
        val v2 = graft.sources.VersionedTable.purge(s, root, pred)
        graft.sources.VersionedTable.vacuum(s, root, keepFrom = v2)
        val back = graft.sources.VersionedTable.read(s, root)
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
