package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X210 — Markov next-event backtest (the first-order-chain
  * evaluation harness; the temporal-split discipline of every
  * sequence-model eval applied to X77's transition matrix): fit the
  * argmax next-event predictor on the FIRST 80 % of the event
  * timeline, score top-1 accuracy on transitions that start in the
  * held-out tail — q137 ships the transition MATRIX, this answers
  * "is the chain actually predictive, out of sample", per source
  * state and pooled, against the majority-class floor. The
  * eval-harness member of the monitoring tier: a pipeline that
  * alerts on q137 drift wants to know whether the chain carried
  * signal in the first place.
  *
  * Determinism: the cutoff day is integer arithmetic on the data's
  * day range (min + 4·span div 5, stated); transition pairs are the
  * (user, ts, event_id)-ordered lag chain; pairs STRADDLING the
  * cutoff belong to neither split (stated); prediction ties break by
  * event-type name; accuracy is one double division of exact longs.
  * Test transitions whose source state never occurred in train are
  * counted separately (`n_unseen` on the pooled row) rather than
  * silently dropped.
  *
  * Scale shape: ONE user-partitioned lag window (the shared
  * session-tier exchange), two map-side groupBys to the |states|²
  * transition frames, an argmax window on that dimension frame, and
  * a broadcast join of the |states| predictor onto the test counts.
  */
object MarkovBacktest {

  /** q243 — out-of-sample top-1 accuracy of the transition argmax. */
  val q243 = GraftQuery(
    "q243_markov_backtest", {
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
              .cast("long").as("day"), col("ts"))
        val cut = ev.agg(
          (min(col("day")) +
            expr("(max(day) - min(day)) * 4 div 5")).as("cut_day"))
        val pairs = ev
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .withColumn("nxt_day", lead(col("day"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .join(broadcast(cut))
          .select(col("event_type").as("cur"), col("nxt"),
            when(col("nxt_day") < col("cut_day"), "train")
              .when(col("day") >= col("cut_day"), "test")
              .otherwise("straddle").as("split"))
        val trainCnt = pairs.filter(col("split") === "train")
          .groupBy(col("cur"), col("nxt"))
          .agg(count(lit(1)).as("c"))
        val pred = trainCnt
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("cur"))
              .orderBy(col("c").desc, col("nxt"))))
          .filter(col("rk") === 1)
          .select(col("cur"), col("nxt").as("pred"))
        val test = pairs.filter(col("split") === "test")
        val perCur = test
          .join(broadcast(pred), Seq("cur"), "left")
          .groupBy(col("cur"))
          .agg(max(col("pred")).as("pred"),
            count(lit(1)).as("n_test"),
            sum(when(col("nxt") === col("pred"), 1L).otherwise(0L))
              .as("n_correct"),
            sum(when(col("pred").isNull, 1L).otherwise(0L))
              .as("n_unseen"))
        val pooled = perCur.agg(
          sum(col("n_test")).as("n_test"),
          sum(col("n_correct")).as("n_correct"),
          sum(col("n_unseen")).as("n_unseen"))
          .select(lit("__all__").as("cur"),
            lit(null).cast("string").as("pred"),
            col("n_test"), col("n_correct"), col("n_unseen"))
        perCur.unionByName(pooled)
          .withColumn("accuracy",
            when(col("n_test") > 0,
              col("n_correct").cast("double") /
                col("n_test").cast("double")))
          .select(col("cur"), col("pred"), col("n_test"),
            col("n_correct"), col("n_unseen"), col("accuracy"))
          .orderBy(col("cur"))
      }
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, event_type,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                 AS day, ts
        FROM events),
      cut AS (
        SELECT MIN(day) + (MAX(day) - MIN(day)) * 4 // 5 AS cut_day
        FROM ev),
      chained AS (
        SELECT event_type AS cur,
               LEAD(event_type, 1) OVER w AS nxt,
               day, LEAD(day, 1) OVER w AS nxt_day
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      pairs AS (
        SELECT cur, nxt,
               CASE WHEN nxt_day < cut_day THEN 'train'
                    WHEN day >= cut_day THEN 'test'
                    ELSE 'straddle' END AS split
        FROM chained, cut WHERE nxt IS NOT NULL),
      train_cnt AS (
        SELECT cur, nxt, COUNT(*) AS c
        FROM pairs WHERE split = 'train' GROUP BY 1, 2),
      pred AS (
        SELECT cur, nxt AS pred FROM (
          SELECT cur, nxt, ROW_NUMBER() OVER (PARTITION BY cur
            ORDER BY c DESC, nxt) AS rk
          FROM train_cnt)
        WHERE rk = 1),
      per_cur AS (
        SELECT t.cur, MAX(p.pred) AS pred, COUNT(*) AS n_test,
               CAST(SUM(CASE WHEN t.nxt = p.pred THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_correct,
               CAST(SUM(CASE WHEN p.pred IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_unseen
        FROM pairs t LEFT JOIN pred p ON p.cur = t.cur
        WHERE t.split = 'test'
        GROUP BY 1),
      pooled AS (
        SELECT '__all__' AS cur, CAST(NULL AS VARCHAR) AS pred,
               CAST(SUM(n_test) AS BIGINT) AS n_test,
               CAST(SUM(n_correct) AS BIGINT) AS n_correct,
               CAST(SUM(n_unseen) AS BIGINT) AS n_unseen
        FROM per_cur),
      unioned AS (
        SELECT * FROM per_cur UNION ALL SELECT * FROM pooled)
      SELECT cur, pred, n_test, n_correct, n_unseen,
             CASE WHEN n_test > 0 THEN
               CAST(n_correct AS DOUBLE) / CAST(n_test AS DOUBLE) END
               AS accuracy
      FROM unioned
      ORDER BY cur
    """))

  val all: Seq[GraftQuery] = Seq(q243)
}
