package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers._

/** Batch analogs of the reference's two pipelines (SURVEY.md §2.3–§2.5):
  * ABSA scoring over a text corpus (documents stands in for the review
  * stream) and vehicle counting over a frame stream (events stands in for
  * frames). The scorer is the frozen deterministic mock — pure Column
  * arithmetic, mirrored in the oracle SQL — so the whole pipeline stays
  * inside whole-stage codegen with zero UDF boundaries.
  */
object PipelineQueries {

  private val predCols: Seq[String] =
    aspects.map(a => a.toLowerCase + "_pred")

  /** documents → normalize → 8 per-aspect predictions. Spark side.
    * Shared with [[AspectComention]] (X206). */
  private[operators] def scores(s: SparkSession, d: String): DataFrame = {
    val withNorm = t(s, d, "documents")
      .select(col("doc_id"), normalize(col("text")).as("norm"))
    aspects.zipWithIndex.foldLeft(withNorm) { case (df, (a, i)) =>
      df.withColumn(a.toLowerCase + "_pred", aspectPred(col("norm"), i))
    }
  }

  private[operators] val scoresCte: String = {
    val preds = aspects.zipWithIndex
      .map { case (a, i) =>
        s"${aspectPredSql("norm", i)} AS ${a.toLowerCase}_pred"
      }
      .mkString(",\n               ")
    s"""norm_docs AS (SELECT doc_id, ${normalizeSql("text")} AS norm FROM documents),
       scores AS (SELECT doc_id, norm,
               $preds
        FROM norm_docs)"""
  }

  /** ABSA inference output (S20/S22 semantics): per-doc 8 aspect classes. */
  val q21 = GraftQuery(
    "q21_absa_scores",
    (s, d) =>
      scores(s, d)
        .select((col("doc_id") +: length(col("norm")).as("norm_len")
          +: predCols.map(col)): _*)
        .orderBy(col("doc_id")),
    Some(s"""
      WITH $scoresCte
      SELECT doc_id, CAST(length(norm) AS INTEGER) AS norm_len,
             ${predCols.mkString(", ")}
      FROM scores
      ORDER BY doc_id
    """))

  /** Dashboard aspect×sentiment histogram with zero-fill (D2,
    * `absa streamlit_app.py:76-82`): melt the 8 wide columns, decode class
    * → sentiment name, count, and left-join the full 8×4 domain.
    */
  val q22 = GraftQuery(
    "q22_absa_histogram",
    (s, d) => {
      val stackExpr = "stack(8, " + aspects.zipWithIndex
        .map { case (a, i) => s"'$a', ${a.toLowerCase}_pred" }
        .mkString(", ") + ") AS (aspect, pred)"
      val counts = scores(s, d)
        .select(expr(stackExpr))
        .select(col("aspect"), decodeSentiment(col("pred")).as("sentiment"))
        .groupBy(col("aspect"), col("sentiment"))
        .agg(count(lit(1)).as("n"))
      val domain = s.range(1)
        .select(explode(array(aspects.map(lit): _*)).as("aspect"))
        .crossJoin(s.range(1)
          .select(explode(array(sentiments.map(lit): _*)).as("sentiment")))
      domain
        .join(counts, Seq("aspect", "sentiment"), "left")
        .select(col("aspect"), col("sentiment"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("aspect"), col("sentiment"))
    },
    Some(s"""
      WITH $scoresCte,
      melted AS (
        ${aspects.zipWithIndex.map { case (a, i) =>
          s"SELECT '$a' AS aspect, ${a.toLowerCase}_pred AS pred FROM scores"
        }.mkString("\n        UNION ALL ")}),
      counts AS (
        SELECT aspect, ${decodeSentimentSql("pred")} AS sentiment,
               COUNT(*) AS n
        FROM melted GROUP BY 1, 2),
      domain AS (
        SELECT a.aspect, s.sentiment
        FROM (SELECT unnest(['${aspects.mkString("','")}']) AS aspect) a
        CROSS JOIN (SELECT unnest(['${sentiments.mkString("','")}']) AS sentiment) s)
      SELECT domain.aspect, domain.sentiment, COALESCE(counts.n, 0) AS n
      FROM domain LEFT JOIN counts
        ON domain.aspect = counts.aspect
       AND domain.sentiment = counts.sentiment
      ORDER BY 1, 2
    """))

  /** Sentiment totals rollup over the histogram (D6,
    * `absa streamlit_app.py:98`): re-aggregate by sentiment only.
    */
  val q23 = GraftQuery(
    "q23_absa_sentiment_totals",
    (s, d) => {
      val stackExpr = "stack(8, " + aspects
        .map(a => s"'$a', ${a.toLowerCase}_pred")
        .mkString(", ") + ") AS (aspect, pred)"
      scores(s, d)
        .select(expr(stackExpr))
        .select(decodeSentiment(col("pred")).as("sentiment"))
        .groupBy(col("sentiment"))
        .agg(count(lit(1)).as("total"))
        .orderBy(col("sentiment"))
    },
    Some(s"""
      WITH $scoresCte,
      melted AS (
        ${aspects.map { a =>
          s"SELECT ${a.toLowerCase}_pred AS pred FROM scores"
        }.mkString("\n        UNION ALL ")})
      SELECT ${decodeSentimentSql("pred")} AS sentiment, COUNT(*) AS total
      FROM melted
      GROUP BY 1
      ORDER BY sentiment
    """))

  /** Text normalization surface (S15) exposed directly. */
  val q24 = GraftQuery(
    "q24_normalize_text",
    (s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), normalize(col("text")).as("norm"))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, ${normalizeSql("text")} AS norm
      FROM documents
      WHERE doc_id < 100
      ORDER BY doc_id
    """))

  /** Decode + regex-extract round trip (S21 + S14): build the reference's
    * `"Price:POS, Shipping:NEU, ..."` decoded string, then pull individual
    * aspect labels back out with `{Aspect}:(\w+)` regexes.
    */
  val q25 = GraftQuery(
    "q25_decode_regex_extract",
    (s, d) => {
      val decoded = concat_ws(", ", aspects.map(a =>
        concat(lit(a + ":"),
          decodeSentiment(col(a.toLowerCase + "_pred")))): _*)
      scores(s, d)
        .filter(col("doc_id") < 200)
        .withColumn("decoded", decoded)
        .select(
          col("doc_id"), col("decoded"),
          regexp_extract(col("decoded"), "Price:(\\w+)", 1).as("price_label"),
          regexp_extract(col("decoded"), "Quality:(\\w+)", 1)
            .as("quality_label"),
          regexp_extract(col("decoded"), "Others:(\\w+)", 1)
            .as("others_label"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $scoresCte,
      dec AS (
        SELECT doc_id,
               ${aspects.map(a =>
                 s"'$a:' || ${decodeSentimentSql(a.toLowerCase + "_pred")}")
                 .mkString(" || ', ' || ")} AS decoded
        FROM scores
        WHERE doc_id < 200)
      SELECT doc_id, decoded,
             regexp_extract(decoded, 'Price:(\\w+)', 1) AS price_label,
             regexp_extract(decoded, 'Quality:(\\w+)', 1) AS quality_label,
             regexp_extract(decoded, 'Others:(\\w+)', 1) AS others_label
      FROM dec
      ORDER BY doc_id
    """))

  /** events-as-frames projection shared by the vehicle queries: mock
    * detection (S23) + second-truncated event time (S18 semantics) +
    * camera id. Pure Column arithmetic.
    */
  private def frames(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").select(
      col("event_id"),
      concat(lit("CAM_"), pmod(col("user_id"), lit(3))).as("camera_id"),
      date_trunc("second", col("ts")).as("frame_time"),
      vehicleType(col("event_id")).as("vehicle_type"),
      vehicleCount(col("event_id")).as("count"))

  private val framesCte: String = s"""frames AS (
        SELECT event_id,
               'CAM_' || CAST(user_id % 3 AS VARCHAR) AS camera_id,
               CAST(date_trunc('second', ts) AS TIMESTAMP) AS frame_time,
               ${vehicleTypeSql("event_id")} AS vehicle_type,
               ${vehicleCountSql("event_id")} AS count
        FROM events)"""

  /** Per-camera, per-type totals (D3, `vehicle streamlit_app.py:91-95`). */
  val q26 = GraftQuery(
    "q26_vehicle_counts_by_camera",
    (s, d) =>
      frames(s, d)
        .groupBy(col("camera_id"), col("vehicle_type"))
        .agg(sum(col("count")).as("total"),
          count(lit(1)).as("n_frames"))
        .orderBy(col("camera_id"), col("vehicle_type")),
    Some(s"""
      WITH $framesCte
      SELECT camera_id, vehicle_type,
             CAST(SUM(count) AS BIGINT) AS total,
             COUNT(*) AS n_frames
      FROM frames
      GROUP BY 1, 2
      ORDER BY camera_id, vehicle_type
    """))

  /** Per-minute traffic trend (D4, `vehicle streamlit_app.py:111-122`). */
  val q27 = GraftQuery(
    "q27_vehicle_trend",
    (s, d) =>
      frames(s, d)
        .groupBy(date_trunc("minute", col("frame_time")).as("bucket"),
          col("vehicle_type"))
        .agg(sum(col("count")).as("total"))
        .orderBy(col("bucket"), col("vehicle_type")),
    Some(s"""
      WITH $framesCte
      SELECT CAST(date_trunc('minute', frame_time) AS TIMESTAMP) AS bucket,
             vehicle_type, CAST(SUM(count) AS BIGINT) AS total
      FROM frames
      GROUP BY 1, 2
      ORDER BY bucket, vehicle_type
    """))

  /** Global dashboard tiles (D5, `vehicle streamlit_app.py:130-132`). */
  val q28 = GraftQuery(
    "q28_vehicle_global",
    (s, d) =>
      frames(s, d).agg(
        sum(col("count")).as("total_vehicles"),
        countDistinct(col("camera_id")).as("n_cameras"),
        countDistinct(col("vehicle_type")).as("n_types"),
        count(lit(1)).as("n_frames")),
    Some(s"""
      WITH $framesCte
      SELECT CAST(SUM(count) AS BIGINT) AS total_vehicles,
             COUNT(DISTINCT camera_id) AS n_cameras,
             COUNT(DISTINCT vehicle_type) AS n_types,
             COUNT(*) AS n_frames
      FROM frames
    """))

  /** Latest-k frames (D7, `vehicle streamlit_app.py:43-49`). */
  val q29 = GraftQuery(
    "q29_latest_frames",
    (s, d) =>
      frames(s, d)
        .orderBy(col("frame_time").desc, col("event_id").desc)
        .limit(200)
        .select(col("event_id"), col("camera_id"), col("frame_time"),
          col("vehicle_type"), col("count")),
    Some(s"""
      WITH $framesCte
      SELECT event_id, camera_id, frame_time, vehicle_type, count
      FROM frames
      ORDER BY frame_time DESC, event_id DESC
      LIMIT 200
    """))

  /** Deterministic sample (D8 stand-in for ORDER BY RANDOM() LIMIT n,
    * `absa streamlit_app.py:42`): an LCG hash filter — reproducible in
    * both engines, unlike engine RNG.
    */
  val q30 = GraftQuery(
    "q30_deterministic_sample",
    (s, d) =>
      t(s, d, "events")
        .filter(pmod(col("event_id") * 1103515245L + 12345L, lit(97L)) < 20)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .orderBy(col("event_id"))
        .limit(300),
    Some("""
      SELECT event_id, user_id, event_type, value
      FROM events
      WHERE (event_id * 1103515245 + 12345) % 97 < 20
      ORDER BY event_id
      LIMIT 300
    """))

  val all: Seq[GraftQuery] =
    Seq(q21, q22, q23, q24, q25, q26, q27, q28, q29, q30)
}
