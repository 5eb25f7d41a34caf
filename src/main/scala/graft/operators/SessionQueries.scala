package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{aspects, decodeSentiment}

/** Sessionization, pivot, and embedding near-dup — the remaining
  * dashboard/pipeline shapes, all with exact oracles.
  */
object SessionQueries {

  /** Batch sessionization (gaps-and-islands): per-user sessions split by
    * >30-minute silences; one row per session. Same shape the streaming
    * `session_window` produces, formulated as two window passes so the
    * DuckDB oracle is exact.
    */
  val q35 = GraftQuery(
    "q35_sessionize",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val newSession = when(
        col("ts").cast("double") -
          lag(col("ts"), 1).over(byUser).cast("double") > 1800d ||
          lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0)
      t(s, d, "events")
        .withColumn("is_new", newSession)
        .withColumn("session_id",
          sum(col("is_new")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch(ts) - epoch(LAG(ts, 1) OVER w) > 1800
                      OR LAG(ts, 1) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, ts, value,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_id
        FROM flagged)
      SELECT user_id, session_id,
             MIN(ts) AS session_start,
             MAX(ts) AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM sessions
      GROUP BY 1, 2
      ORDER BY user_id, session_id
    """))

  /** Pivot: sentiment × aspect matrix (D2's wide dashboard form). The
    * oracle mirrors with CASE sums, so column names line up exactly.
    */
  val q36 = GraftQuery(
    "q36_pivot",
    (s, d) => {
      val stackExpr = "stack(8, " + aspects
        .map(a => s"'$a', ${a.toLowerCase}_pred").mkString(", ") +
        ") AS (aspect, pred)"
      val scored = aspects.zipWithIndex.foldLeft(
        t(s, d, "documents").select(col("doc_id"),
          graft.functions.MockScorers.normalize(col("text")).as("norm"))) {
        case (df, (a, i)) =>
          df.withColumn(a.toLowerCase + "_pred",
            graft.functions.MockScorers.aspectPred(col("norm"), i))
      }
      scored
        .select(expr(stackExpr))
        .select(col("aspect"), decodeSentiment(col("pred")).as("sentiment"))
        .groupBy(col("sentiment"))
        .pivot("aspect", aspects)
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("sentiment"))
    },
    Some {
      val caseCols = aspects.zipWithIndex.map { case (a, i) =>
        s"CAST(COUNT(*) FILTER (WHERE aspect = '$a') AS BIGINT) AS $a"
      }.mkString(",\n             ")
      s"""
      WITH norm_docs AS (
        SELECT doc_id, ${graft.functions.MockScorers.normalizeSql("text")} AS norm
        FROM documents),
      melted AS (
        ${aspects.zipWithIndex.map { case (a, i) =>
          s"SELECT '$a' AS aspect, ${graft.functions.MockScorers
            .aspectPredSql("norm", i)} AS pred FROM norm_docs"
        }.mkString("\n        UNION ALL ")})
      SELECT ${graft.functions.MockScorers.decodeSentimentSql("pred")} AS sentiment,
             $caseCols
      FROM melted
      GROUP BY 1
      ORDER BY sentiment
    """
    })

  /** Embedding-cosine near-dup pairs (the dedup family's vector member):
    * exact pairwise cosine ≥ 0.35 over a bounded id range, via the native
    * DotProduct kernel — oracle-exact like q45/q46.
    */
  val q54 = GraftQuery(
    "q54_embedding_near_dup",
    (s, d) => {
      import graft.functions.expressions.VectorFunctions
      val e = t(s, d, "embeddings")
        .filter(col("vec_id") < 300)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm", sqrt(VectorFunctions.sqNorm(col("emb"))))
      val a = e.select(col("vec_id").as("ia"), col("emb").as("ea"),
        col("nrm").as("na"))
      val b = e.select(col("vec_id").as("ib"), col("emb").as("eb"),
        col("nrm").as("nb"))
      a.join(b, col("ia") < col("ib"))
        .withColumn("cosine",
          VectorFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.35)
        .select(col("ia"), col("ib"), round(col("cosine"), 6).as("cosine_r"))
        .orderBy(col("ia"), col("ib"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding::DOUBLE[], x -> x * x)),
                 (acc, v) -> acc + v)) AS nrm
        FROM embeddings WHERE vec_id < 300)
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(a.emb, (x, i) -> x * b.emb[i])),
               (acc, v) -> acc + v) / (a.nrm * b.nrm), 6) AS cosine_r
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(a.emb, (x, i) -> x * b.emb[i])),
              (acc, v) -> acc + v) / (a.nrm * b.nrm) >= 0.35
      ORDER BY ia, ib
    """))

  /** Time-series subsequence similarity (the retrieved EDBT/ICDE
    * streaming-similarity family): the 25 closest length-8 windows of
    * any user's value series to a fixed query pattern, by squared L2.
    * Scale shape: ONE user-partition shuffle builds the lag chain (the
    * same clustering q35 uses — at 100 TB the two share an exchange),
    * the distance to the constant pattern is a projection (explicit
    * left-associated 8-term sum, bit-identical in both engines), and
    * the global top-25 compiles to TakeOrderedAndProject — per-
    * partition heaps, no global sort. The z-normalized and
    * multi-pattern variants change the projection, not the plan.
    */
  val q97 = GraftQuery(
    "q97_ts_pattern_match", {
      val pattern = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0)
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val lags = pattern.indices.map(i =>
          lag(col("value"), pattern.size - 1 - i).over(w))
        val dist = lags.zip(pattern)
          .map { case (v, p) => (v - p) * (v - p) }
          .reduceLeft(_ + _)
        t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("dist2", dist)
          .filter(col("dist2").isNotNull)
          .select(col("user_id"), col("event_id").as("anchor_event"),
            round(col("dist2"), 6).as("dist2_r"))
          .orderBy(col("dist2_r"), col("user_id"), col("anchor_event"))
          .limit(25)
      }
    },
    Some {
      val pattern = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0)
      val lagCols = pattern.indices.map(i =>
        s"LAG(value, ${pattern.size - 1 - i}) OVER w AS v$i")
        .mkString(",\n               ")
      val distExpr = pattern.zipWithIndex
        .map { case (p, i) => s"(v$i - $p) * (v$i - $p)" }
        .mkString(" + ")
      s"""
      WITH lagged AS (
        SELECT user_id, event_id, value,
               $lagCols
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      scored AS (
        SELECT user_id, event_id AS anchor_event,
               round($distExpr, 6) AS dist2_r
        FROM lagged)
      SELECT user_id, anchor_event, dist2_r
      FROM scored
      WHERE dist2_r IS NOT NULL
      ORDER BY dist2_r, user_id, anchor_event
      LIMIT 25
    """
    })

  /** Retention cohort matrix — (first-activity day, day offset,
    * distinct active users): the product-analytics table every event
    * warehouse serves. Two user-keyed aggregations (first day, then
    * the distinct-day activity), both map-side combined; day
    * arithmetic is integer floor over epoch seconds, exact in both
    * engines.
    */
  val q98 = GraftQuery(
    "q98_retention_cohorts",
    (s, d) => {
      val day = floor(col("ts").cast("double") / 86400).cast("long")
      val activity = t(s, d, "events")
        .select(col("user_id"), day.as("day")).distinct()
      val firstDay = activity.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      activity.join(firstDay, "user_id")
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""
      WITH activity AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events),
      cohorts AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY 1)
      SELECT cohort_day, day - cohort_day AS day_offset,
             COUNT(DISTINCT a.user_id) AS n_users
      FROM activity a JOIN cohorts USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort_day, day_offset
    """))

  /** STRICT sequential funnel (signup → view → click → purchase, each
    * stage after a qualified prior stage): per-user stage flags built
    * as three chained cumulative-max window layers over ONE (user_id,
    * ts, event_id) clustering — the q35 discipline: every layer reuses
    * the same exchange, so the whole funnel costs a single shuffle at
    * any scale (a per-stage conditional-min join chain would re-shuffle
    * the event stream once per stage). Output: users reaching each
    * stage.
    */
  val q99 = GraftQuery(
    "q99_event_funnel",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val l1 = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("seen_signup",
          max(when(col("event_type") === "signup", 1).otherwise(0)).over(w))
      val l2 = l1.withColumn("seen_view",
        max(when(col("event_type") === "view" && col("seen_signup") === 1, 1)
          .otherwise(0)).over(w))
      val l3 = l2.withColumn("seen_click",
        max(when(col("event_type") === "click" && col("seen_view") === 1, 1)
          .otherwise(0)).over(w))
      val l4 = l3.withColumn("seen_purchase",
        max(when(col("event_type") === "purchase" && col("seen_click") === 1,
          1).otherwise(0)).over(w))
      l4.groupBy(col("user_id"))
        .agg(max(col("seen_signup")).as("s1"), max(col("seen_view")).as("s2"),
          max(col("seen_click")).as("s3"), max(col("seen_purchase")).as("s4"))
        .agg(sum(col("s1")).as("n_signup"),
          sum(col("s2")).as("n_view_after"),
          sum(col("s3")).as("n_click_after"),
          sum(col("s4")).as("n_purchase_after"))
    },
    Some("""
      WITH l1 AS (
        SELECT user_id, ts, event_id, event_type,
               MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                 OVER w AS seen_signup
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)),
      l2 AS (
        SELECT *, MAX(CASE WHEN event_type = 'view' AND seen_signup = 1
                           THEN 1 ELSE 0 END) OVER w AS seen_view
        FROM l1
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)),
      l3 AS (
        SELECT *, MAX(CASE WHEN event_type = 'click' AND seen_view = 1
                           THEN 1 ELSE 0 END) OVER w AS seen_click
        FROM l2
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)),
      l4 AS (
        SELECT *, MAX(CASE WHEN event_type = 'purchase' AND seen_click = 1
                           THEN 1 ELSE 0 END) OVER w AS seen_purchase
        FROM l3
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)),
      per_user AS (
        SELECT user_id, MAX(seen_signup) AS s1, MAX(seen_view) AS s2,
               MAX(seen_click) AS s3, MAX(seen_purchase) AS s4
        FROM l4 GROUP BY 1)
      SELECT CAST(SUM(s1) AS BIGINT) AS n_signup,
             CAST(SUM(s2) AS BIGINT) AS n_view_after,
             CAST(SUM(s3) AS BIGINT) AS n_click_after,
             CAST(SUM(s4) AS BIGINT) AS n_purchase_after
      FROM per_user
    """))

  val all: Seq[GraftQuery] = Seq(q35, q36, q54, q97, q98, q99)
}
