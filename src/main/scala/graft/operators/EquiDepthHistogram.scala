package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X99 — equi-depth histogram statistics: k buckets holding ~n/k rows
  * each, with interpolated boundaries — the selectivity-estimation
  * statistic every cost-based optimizer keeps per column (Spark's own
  * ANALYZE ... FOR COLUMNS builds exactly this shape), and the
  * skew-visualization primitive a dashboard bins with. Equi-WIDTH
  * bins (q22's zero-filled histogram) hide skew — one hot bin, the
  * rest empty; equi-DEPTH bounds adapt so bucket WIDTH is the skew
  * signal.
  *
  * Determinism: boundaries are ONE interpolated exact percentile
  * vector (Spark `percentile` ≡ DuckDB `quantile_cont`, the q145
  * argument); bucket assignment counts strict boundary crossings with
  * `size(filter(bounds, b -> v > b))` — integer comparisons on
  * bit-identical doubles; per-bucket counts are exact.
  *
  * Scale shape: one exact-percentile pass (the X88 caveat: swaps to
  * the q75 GK sketch at 100 TB, same plan), then one map-side bucket
  * assignment against the broadcast k−1-double vector and a k-row
  * count agg. No window, no second corpus shuffle.
  */
object EquiDepthHistogram {

  /** Buckets. */
  val K = 10

  /** The histogram with a pluggable boundary pass. `approx = true` is
    * the 100 TB form: the exact `percentile` holds a per-group sorted
    * buffer of every value (linear memory — the r12 decade probe
    * measured the exact pass going exponent 0.98 and 52 s at 60M rows,
    * the flagged swap point), while Greenwald–Khanna
    * (`approx_percentile`, accuracy 1/ε) keeps O((1/ε)·log εN) state
    * and bounds rank error at ε·n — bucket depths stay ~n/k ± ε·n.
    * The exact form is the oracle-checked q148; same plan either way.
    */
  def histogram(li: DataFrame, approx: Boolean): DataFrame = {
    val quantiles = (1 until K).map(i => i.toDouble / K)
    val vals = li.select(col("v"))
    val boundExpr =
      if (approx)
        s"approx_percentile(v, array(${quantiles.mkString(", ")}), 10000)"
      else s"percentile(v, array(${quantiles.mkString(", ")}))"
    val bounds = vals.agg(expr(boundExpr).as("bs"),
      min(col("v")).as("lo0"), max(col("v")).as("hiK"))
    vals.join(broadcast(bounds))
      .withColumn("bucket",
        (size(filter(col("bs"), b => col("v") > b)) + 1))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(first(when(col("bucket") === 1, col("lo0"))
          .otherwise(element_at(col("bs"), col("bucket") - 1))), 2)
          .as("lo_r"),
        round(first(when(col("bucket") === K, col("hiK"))
          .otherwise(element_at(col("bs"), col("bucket")))), 2)
          .as("hi_r"))
      .orderBy(col("bucket"))
  }

  /** q148 — 10-bucket equi-depth histogram of l_extendedprice. */
  val q148 = GraftQuery(
    "q148_equidepth_histogram", {
      (s, d) => histogram(
        t(s, d, "lineitem").select(col("l_extendedprice").as("v")),
        approx = false)
    },
    Some(s"""
      WITH vals AS (SELECT l_extendedprice AS v FROM lineitem),
      bounds AS (
        SELECT quantile_cont(v,
                 [${(1 until K).map(i => i.toDouble / K).mkString(", ")}])
               AS bs,
               min(v) AS lo0, max(v) AS hiK
        FROM vals),
      assigned AS (
        SELECT CAST(len(list_filter(b.bs, x -> v.v > x)) + 1 AS INTEGER)
                 AS bucket,
               v.v, b.bs, b.lo0, b.hiK
        FROM vals v CROSS JOIN bounds b)
      SELECT bucket, count(*) AS n_rows,
             round(CASE WHEN bucket = 1 THEN any_value(lo0)
                   ELSE any_value(bs)[bucket - 1] END, 2) AS lo_r,
             round(CASE WHEN bucket = $K THEN any_value(hiK)
                   ELSE any_value(bs)[bucket] END, 2) AS hi_r
      FROM assigned
      GROUP BY bucket
      ORDER BY bucket
    """))

  val all: Seq[GraftQuery] = Seq(q148)
}
