package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X246 — KPSS level-stationarity test (Kwiatkowski, Phillips,
  * Schmidt & Shin 1992) on each event type's hourly-volume series:
  * the null-reversal complement to the trend tier — q237's
  * Mann–Kendall must REJECT randomness to call a trend, so a flat
  * verdict can just mean low power; KPSS puts STATIONARITY on trial
  * instead (η = n⁻² Σₜ Sₜ²/σ̂², Sₜ the partial sums of residuals), so
  * "rejected" here means the level genuinely wanders (unit root /
  * regime drift) — the pairing every monitoring stack runs both ways.
  * Short-run form: l = 0 (no Bartlett long-run correction — the
  * iid-error variant; the hourly census is the engine's shortest
  * sampling grid and the l4 window would eat half of a 30-day span).
  *
  * Determinism: counts are exact longs; n·Sₜ = n·Pₜ − t·Pₙ is an
  * exact long per row, squared on DECIMAL(18,0)→(38,0) lanes (exact,
  * associative), and η = ΣQ²/(n²·(n·Σx² − Pₙ²)) is ONE double
  * division of exact integers. The 5 % critical value 0.463 (KPSS
  * Table 1, level case) is an embedded literal. Constant series
  * (zero variance) → NULL η.
  *
  * Scale shape: one corpus pass to the |types × hours| census; the
  * running sum and index are windows PARTITIONED by type on that
  * dimension frame; one ≤|types|-row fold. Corpus touched once.
  */
object Kpss {

  /** KPSS 5 % critical value, level stationarity (η_μ). */
  private val Crit = 0.463d

  /** q274 — per-type level-stationarity of hourly event volume. */
  val q274 = GraftQuery(
    "q274_kpss_level", {
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            floor(unix_timestamp(date_trunc("hour", col("ts"))) /
              lit(3600.0d)).cast("long").as("h"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("g")).orderBy(col("h"))
        val cum = hourly
          .withColumn("j", row_number().over(w).cast("long"))
          .withColumn("p",
            sum(col("x")).over(w.rowsBetween(
              Window.unboundedPreceding, Window.currentRow)))
        val tot = hourly.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("pn"),
            sum(col("x") * col("x")).as("sxx"))
        cum.join(tot, "g")
          .withColumn("q",
            (col("n") * col("p") - col("j") * col("pn"))
              .cast("decimal(18,0)"))
          .groupBy(col("g"))
          .agg(max(col("n")).as("n_hours"), max(col("pn")).as("pn"),
            max(col("sxx")).as("sxx"),
            sum(col("q") * col("q")).as("sq2"))
          .withColumn("dvar",
            col("n_hours") * col("sxx") - col("pn") * col("pn"))
          .withColumn("eta",
            when(col("dvar") > 0L,
              round(col("sq2").cast("double") /
                (col("n_hours").cast("double") *
                  col("n_hours").cast("double") *
                  col("dvar").cast("double")), 6)))
          .select(col("g").as("event_type"), col("n_hours"),
            col("eta").as("eta_r"),
            (col("eta") > Crit).as("nonstationary"))
          .orderBy(col("event_type"))
      }
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type AS g,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600
                 AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      cum AS (
        SELECT g, x,
               CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY h)
                 AS BIGINT) AS j,
               SUM(x) OVER (PARTITION BY g ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS p
        FROM hourly),
      tot AS (
        SELECT g, COUNT(*) AS n, SUM(x) AS pn, SUM(x * x) AS sxx
        FROM hourly GROUP BY g),
      folded AS (
        SELECT c.g, MAX(t.n) AS n_hours,
               MAX(t.pn) AS pn, MAX(t.sxx) AS sxx,
               SUM(CAST(t.n * c.p - c.j * t.pn AS DECIMAL(18,0))
                 * CAST(t.n * c.p - c.j * t.pn AS DECIMAL(18,0)))
                 AS sq2
        FROM cum c JOIN tot t ON t.g = c.g
        GROUP BY c.g)
      SELECT g AS event_type, CAST(n_hours AS BIGINT) AS n_hours,
             CASE WHEN n_hours * sxx - pn * pn > 0 THEN
               round(CAST(sq2 AS DOUBLE)
                 / (CAST(n_hours AS DOUBLE) * CAST(n_hours AS DOUBLE)
                   * CAST(n_hours * sxx - pn * pn AS DOUBLE)), 6)
             END AS eta_r,
             CASE WHEN n_hours * sxx - pn * pn > 0 THEN
               round(CAST(sq2 AS DOUBLE)
                 / (CAST(n_hours AS DOUBLE) * CAST(n_hours AS DOUBLE)
                   * CAST(n_hours * sxx - pn * pn AS DOUBLE)), 6)
             END > $Crit AS nonstationary
      FROM folded
      ORDER BY event_type
    """))

  val all: Seq[GraftQuery] = Seq(q274)
}
