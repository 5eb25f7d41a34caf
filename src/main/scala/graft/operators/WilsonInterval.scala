package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X241 — Wilson score intervals (Wilson 1927) + two-proportion z for
  * the per-source quality-gate pass rate: the UNCERTAINTY companion to
  * the point-rate dashboards — a source passing 18/20 and a source
  * passing 1800/2000 both read "90 %", but only one of them is known
  * to 1 %. The Wilson interval is the standard small-n-safe binomial
  * CI (never leaves [0,1], behaves at p̂ ∈ {0,1} where the Wald
  * interval collapses), and the pooled two-proportion z against the
  * REST of the corpus is the per-source anomaly gate: flag a source
  * only when its rate is incompatible with everyone else's.
  *
  * Determinism: the gate is q249's exact quality predicate (integer/
  * 4-dp leaves); (n, x) are exact longs per source; the Wilson bounds
  * and z are each ONE double tree over those longs with the z₀.₉₇₅
  * literal embedded on both engines; sqrt is IEEE correctly-rounded.
  * Degenerate pooled rates (0 or 1) → NULL z.
  *
  * Scale shape: one corpus scan → a |sources|-row aggregate; the
  * corpus-total row joins back via broadcast. No window, no pair
  * face; at 100 TB this is one map-side-combined pass.
  */
object WilsonInterval {

  /** z(0.975), embedded on both engines. */
  private val Z = 1.9599639845400536d

  /** q281 — Wilson 95 % CI per source + pooled z vs the rest. */
  val q281 = GraftQuery(
    "q281_wilson_gate_rates", {
      (s, d) => {
        val gated = t(s, d, "documents")
          .withColumn("norm", normalize(col("text")))
          .withColumn("n_words", size(split(col("norm"), " ")))
          .withColumn("punct_ratio",
            round(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))
              .cast("double") / length(col("text")), 4))
          .withColumn("pass",
            TextFeatures.quality(col("n_words"), col("punct_ratio"))
              >= 0.5d)
        val perSrc = gated.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pass"), 1L).otherwise(0L)).as("x"))
        val totals = perSrc.agg(sum(col("n")).as("nn"),
          sum(col("x")).as("xx"))
        val zc = lit(Z)
        val nD = col("n").cast("double")
        val xD = col("x").cast("double")
        val p = xD / nD
        val z2 = zc * zc
        val denom = lit(1.0d) + z2 / nD
        val center = p + z2 / (lit(2.0d) * nD)
        val spread = zc * sqrt(p * (lit(1.0d) - p) / nD +
          z2 / (lit(4.0d) * nD * nD))
        val nr = (col("nn") - col("n")).cast("double")
        val pr = (col("xx") - col("x")).cast("double") / nr
        val pp = col("xx").cast("double") / col("nn").cast("double")
        perSrc.join(broadcast(totals))
          .withColumn("p_r", round(p, 6))
          .withColumn("wilson_lo_r",
            round((center - spread) / denom, 6))
          .withColumn("wilson_hi_r",
            round((center + spread) / denom, 6))
          .withColumn("z_r",
            when(col("nn") > col("n") && pp > 0d && pp < 1d,
              round((p - pr) /
                sqrt(pp * (lit(1.0d) - pp) *
                  (lit(1.0d) / nD + lit(1.0d) / nr)), 6)))
          .withColumn("outlier",
            when(col("z_r").isNotNull, abs(col("z_r")) > Z))
          .select(col("source"), col("n"), col("x"), col("p_r"),
            col("wilson_lo_r"), col("wilson_hi_r"), col("z_r"),
            col("outlier"))
          .orderBy(col("source"))
      }
    },
    Some(s"""
      WITH gated AS (
        SELECT source,
               ${TextFeatures.qualitySql(
                 "len(string_split(" + normalizeSql("text") + ", ' '))",
                 "round(CAST(len(regexp_extract_all(text, " +
                   "'[^a-zA-Z0-9 ]')) AS DOUBLE) / length(text), 4)")}
                 >= 0.5 AS pass
        FROM documents),
      persrc AS (
        SELECT source, COUNT(*) AS n,
               CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                 AS x
        FROM gated GROUP BY source),
      totals AS (SELECT SUM(n) AS nn, SUM(x) AS xx FROM persrc),
      calc AS (
        SELECT source, n, x, nn, xx,
               CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
               $Z * $Z AS z2,
               CAST(n AS DOUBLE) AS nd,
               CAST(nn - n AS DOUBLE) AS nr,
               CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) AS pp,
               CAST(xx - x AS DOUBLE) / CAST(nn - n AS DOUBLE) AS pr
        FROM persrc CROSS JOIN totals)
      SELECT source, n, x, round(p, 6) AS p_r,
             round((p + z2 / (2.0 * nd)
               - $Z * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd)))
               / (1.0 + z2 / nd), 6) AS wilson_lo_r,
             round((p + z2 / (2.0 * nd)
               + $Z * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd)))
               / (1.0 + z2 / nd), 6) AS wilson_hi_r,
             CASE WHEN nn > n AND pp > 0 AND pp < 1 THEN
               round((p - pr) / sqrt(pp * (1.0 - pp)
                 * (1.0 / nd + 1.0 / nr)), 6)
             END AS z_r,
             CASE WHEN nn > n AND pp > 0 AND pp < 1 THEN
               ABS(round((p - pr) / sqrt(pp * (1.0 - pp)
                 * (1.0 / nd + 1.0 / nr)), 6)) > $Z
             END AS outlier
      FROM calc
      ORDER BY source
    """))

  val all: Seq[GraftQuery] = Seq(q281)
}
