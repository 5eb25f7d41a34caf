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
    val bounds =
      if (approx)
        vals.agg(expr(
          s"approx_percentile(v, array(${quantiles.mkString(", ")}), " +
            "10000)").as("bs"),
          min(col("v")).as("lo0"), max(col("v")).as("hiK"))
      else exactBounds(vals, quantiles)
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

  /** Exact interpolated percentile vector WITHOUT the linear
    * `percentile` aggregate buffer (r19 optimization, guide §2/§5):
    * Spark's exact `percentile` merges a value→count map of every
    * distinct value onto one final-aggregation task and sorts it
    * there — the single-task memory wall the r12 decade probe
    * measured (52 s / exponent 0.98 at 60M rows). This form computes
    * the same order statistics distributively: global row numbers via
    * the two-level bucketed prefix swap (no single-partition
    * anything), then for each requested quantile the floor/ceil
    * order-statistic rows are picked and combined with EXACTLY
    * Spark's interpolation arithmetic — position = q·(n−1),
    * `(higher − position) · lowerVal + (position − lower) · higherVal`
    * (Percentile.getPercentile's op order) — so the boundary vector
    * is bit-identical to the aggregate's and the q148 oracle hash is
    * unchanged. Ties are safe: row_number among equal values is
    * arbitrary but every tied row carries the same `v`, and the
    * order statistic reads only `v`.
    */
  private[operators] def exactBounds(vals: DataFrame,
      quantiles: Seq[Double]): DataFrame = {
    val ranked = RankSum.bucketedRowNumber(
      vals, col("v").cast("double"), "rn", withTotal = true, col("v"))
    // one row per needed order statistic: for each quantile, the
    // 1-based floor and ceil positions of q·(n−1)
    val wantedCols = Seq(col("v"), col("rn")) ++
      quantiles.zipWithIndex.map { case (q, i) =>
        val pos = lit(q) * (col("n_total") - 1L).cast("double")
        struct(floor(pos).cast("long").as("lo"),
          ceil(pos).cast("long").as("hi"), pos.as("pos"))
          .as(s"p_$i")
      }
    val wanted = ranked.select(wantedCols: _*)
    val picked = wanted.filter(
      quantiles.indices
        .map(i => col("rn") === col(s"p_$i.lo") + 1L ||
          col("rn") === col(s"p_$i.hi") + 1L)
        .reduce(_ || _))
    // ≤ 2·|quantiles| rows fold to one row; the interpolation tree
    // mirrors Percentile.getPercentile term for term
    val terms = quantiles.indices.flatMap { i =>
      Seq(
        max(when(col("rn") === col(s"p_$i.lo") + 1L, col("v")))
          .as(s"lov_$i"),
        max(when(col("rn") === col(s"p_$i.hi") + 1L, col("v")))
          .as(s"hiv_$i"),
        max(col(s"p_$i.pos")).as(s"pos_$i"),
        max(col(s"p_$i.lo")).as(s"lo_$i"),
        max(col(s"p_$i.hi")).as(s"hi_$i"))
    }
    val folded = picked.agg(terms.head, terms.tail: _*)
    val bs = array(quantiles.indices.map { i =>
      when(col(s"hi_$i") === col(s"lo_$i"), col(s"lov_$i"))
        .when(col(s"hiv_$i") === col(s"lov_$i"), col(s"lov_$i"))
        .otherwise(
          (col(s"hi_$i").cast("double") - col(s"pos_$i")) *
            col(s"lov_$i") +
            (col(s"pos_$i") - col(s"lo_$i").cast("double")) *
              col(s"hiv_$i"))
    }: _*)
    val span = vals.agg(min(col("v")).as("lo0"), max(col("v")).as("hiK"))
    folded.select(bs.as("bs")).join(broadcast(span))
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
