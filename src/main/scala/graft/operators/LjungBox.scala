package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X197 — Ljung–Box portmanteau white-noise audit (Ljung & Box 1978,
  * Biometrika 65; the finite-sample refinement of Box & Pierce 1970):
  * for each feed's hourly-count series, the autocorrelations at lags
  * 1..[[MaxLag]] and the pooled Q statistic
  *   Q = n(n+2) Σ_k r_k²/(n−k),
  * which under the white-noise null is χ²([[MaxLag]]) — the one-number
  * answer to "is this feed's hourly texture serially dependent AT ANY
  * short lag", where X162's acf1 sees only lag 1 and X164 only the
  * 24-hour seasonal lag. The standard pre-model residual diagnostic,
  * here used as the pipeline-health gauge: a rejected feed has
  * structure (ramp, burst train, periodicity) worth X143/X164's
  * localized follow-ups.
  *
  * The ACF estimator is over the OBSERVED hourly series (consecutive
  * observed hours; compose with X128's gap-fill for a zero-filled
  * grid — same statement as X162). Rejection threshold = the χ²(6)
  * 0.95 quantile embedded as a literal (the X147 DP-release
  * inverse-CDF discipline): no p-value libraries on either engine.
  *
  * Determinism (the X162 idiom, per lag): exact long leaves — n,
  * S1 = Σx, S2 = Σx², and per lag k: P_k = Σ x_t·x_{t+k}, head/tail
  * sums over the paired rows — then ONE FIXED double tree per r_k and
  * one fixed summation order for Q (r_1 first). A constant series has
  * denominator exactly 0 → NULLs (stated, guarded in both engines).
  *
  * Scale shape: one map-side-combined groupBy to the |types × hours|
  * frame, ONE per-type window producing all six leads (a single
  * exchange, shared with the X162/X164/X180 family), one groupBy to
  * |types| rows carrying 6×4 conditional sums. Scan-bound.
  */
object LjungBox {

  val MaxLag = 6

  /** χ²(6) quantile at 0.95 — Abramowitz & Stegun table value. */
  val ChiSq95: Double = 12.591587243743977

  /** Series shorter than this are excluded (the estimator needs
    * n ≫ MaxLag; 4× is the pinned floor).
    */
  val MinHours: Int = 4 * MaxLag

  private def rkExpr(k: Int): String =
    s"case when den != 0.0 then (cast(p_$k as double) " +
      s"- mean * cast(hs_$k + ts_$k as double) " +
      s"+ cast(m_$k as double) * mean * mean) / den end"

  /** q233 — per-type ACF(1..6) + Ljung–Box Q + white-noise verdict. */
  val q233 = GraftQuery(
    "q233_ljung_box", {
      (s, d) => {
        val w = Window.partitionBy(col("g")).orderBy(col("h"))
        val led = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
          .select(col("g") +: col("x") +:
            (1 to MaxLag).map(k => lead(col("x"), k).over(w)
              .as(s"xn_$k")): _*)
        val aggs =
          Seq(count(lit(1)).as("n"), sum(col("x")).as("s1"),
            sum(col("x") * col("x")).as("s2")) ++
          (1 to MaxLag).flatMap { k =>
            Seq(sum(col("x") * col(s"xn_$k")).as(s"p_$k"),
              sum(when(col(s"xn_$k").isNotNull, col("x"))).as(s"hs_$k"),
              sum(col(s"xn_$k")).as(s"ts_$k"),
              count(col(s"xn_$k")).as(s"m_$k"))
          }
        val rks = led.groupBy(col("g"))
          .agg(aggs.head, aggs.tail: _*)
          .filter(col("n") >= MinHours)
          .withColumn("mean", expr("cast(s1 as double) / cast(n as double)"))
          .withColumn("den", expr(
            "cast(s2 as double) - cast(n as double) * mean * mean"))
        val withR = (1 to MaxLag).foldLeft(rks) { (df, k) =>
          df.withColumn(s"r$k", expr(rkExpr(k)))
        }
        withR
          .withColumn("q_lb", expr(
            "case when den != 0.0 then " +
              "cast(n as double) * cast(n + 2 as double) * (" +
              (1 to MaxLag).map(k =>
                s"r$k * r$k / cast(n - $k as double)").mkString(" + ") +
              ") end"))
          .withColumn("white_noise_rejected",
            when(col("den") =!= 0.0, col("q_lb") > ChiSq95))
          .select(col("g") +: col("n").as("n_hours") +:
            ((1 to MaxLag).map(k => col(s"r$k")) ++
              Seq(col("q_lb"), col("white_noise_rejected"))): _*)
          .orderBy(col("g"))
      }
    },
    Some {
      val lagAggs = (1 to MaxLag).map { k =>
        s"""CAST(SUM(x * xn_$k) AS BIGINT) AS p_$k,
               CAST(SUM(CASE WHEN xn_$k IS NOT NULL THEN x END)
                 AS BIGINT) AS hs_$k,
               CAST(SUM(xn_$k) AS BIGINT) AS ts_$k,
               COUNT(xn_$k) AS m_$k"""
      }.mkString(",\n               ")
      val rkSql = (1 to MaxLag).map { k =>
        s"""CASE WHEN den != 0.0 THEN (CAST(p_$k AS DOUBLE)
                 - mean * CAST(hs_$k + ts_$k AS DOUBLE)
                 + CAST(m_$k AS DOUBLE) * mean * mean) / den END AS r$k"""
      }.mkString(",\n             ")
      val qSum = (1 to MaxLag)
        .map(k => s"r$k * r$k / CAST(n - $k AS DOUBLE)")
        .mkString(" + ")
      s"""
      WITH hourly AS (
        SELECT event_type AS g, date_trunc('hour', ts) AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      led AS (
        SELECT g, x,
               ${(1 to MaxLag).map(k =>
                 s"LEAD(x, $k) OVER (PARTITION BY g ORDER BY h) AS xn_$k")
                 .mkString(",\n               ")}
        FROM hourly),
      sums AS (
        SELECT g, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s1,
               CAST(SUM(x * x) AS BIGINT) AS s2,
               $lagAggs
        FROM led GROUP BY 1
        HAVING COUNT(*) >= $MinHours),
      based AS (
        SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS den
        FROM sums),
      rs AS (
        SELECT g, n,
             $rkSql
        FROM based),
      qq AS (
        SELECT g, n AS n_hours, r1, r2, r3, r4, r5, r6,
               CASE WHEN r1 IS NOT NULL THEN
                 CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * ($qSum)
               END AS q_lb
        FROM rs)
      SELECT g, n_hours, r1, r2, r3, r4, r5, r6, q_lb,
             CASE WHEN q_lb IS NOT NULL THEN q_lb > $ChiSq95 END
               AS white_noise_rejected
      FROM qq
      ORDER BY g
    """
    })

  val all: Seq[GraftQuery] = Seq(q233)
}
