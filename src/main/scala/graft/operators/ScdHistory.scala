package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X106 — SCD Type-2 dimension-history construction (Kimball's
  * slowly-changing-dimension pattern): turn a change LOG (per-entity
  * attribute observations over time) into a HISTORY table of validity
  * intervals — (entity, attr, valid_from, valid_to, is_current) with
  * consecutive duplicate observations collapsed — the warehouse
  * operator behind every "as of time T, what was the user's segment"
  * join, and the dimension-side counterpart of the X13 as-of join
  * (which consumes exactly this interval shape).
  *
  * Semantics: per entity, observations ordered by (ts, event_id — the
  * total tiebreak); an observation opens a new interval iff it is the
  * entity's first or its attribute differs from the previous
  * observation (the SCD2 change test); each interval closes at the
  * next interval's open (half-open [from, to)), the last stays open
  * (valid_to null, is_current true).
  *
  * Determinism: pure lag/lead over a total per-entity order; no
  * floats anywhere. Scale shape: two windows, both PARTITIONED by
  * entity (corpus-partitionable at any scale), no join, no broadcast;
  * the change filter collapses the frame before the second window.
  */
object ScdHistory {

  /** q153 — SCD2 history of each user's event_type attribute over the
    * events change log.
    */
  val q153 = GraftQuery(
    "q153_scd2_history", {
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val changes = t(s, d, "events")
          .select(col("user_id"), col("event_type").as("attr"),
            col("ts"), col("event_id"))
          .withColumn("prev", lag(col("attr"), 1).over(wOrd))
          .filter(col("prev").isNull || col("attr") =!= col("prev"))
        val wNext = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        changes
          .withColumn("valid_to", lead(col("ts"), 1).over(wNext))
          .select(col("user_id"), col("event_id").as("change_id"),
            col("attr"), col("ts").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"))
          .orderBy(col("user_id"), col("valid_from"), col("change_id"))
      }
    },
    Some("""
      WITH ordered AS (
        SELECT user_id, event_type AS attr, ts, event_id,
               lag(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      changes AS (
        SELECT user_id, attr, ts, event_id FROM ordered
        WHERE prev IS NULL OR attr <> prev),
      hist AS (
        SELECT user_id, event_id AS change_id, attr, ts AS valid_from,
               lead(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM changes)
      SELECT user_id, change_id, attr, valid_from, valid_to,
             valid_to IS NULL AS is_current
      FROM hist
      ORDER BY user_id, valid_from, change_id
    """))

  val all: Seq[GraftQuery] = Seq(q153)
}
