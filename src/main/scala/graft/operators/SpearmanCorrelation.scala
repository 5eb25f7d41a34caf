package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** X194 — exact Spearman rank correlation (Spearman 1904): Pearson on
  * average-tie ranks — the monotone-association gauge X102's Pearson
  * matrix cannot give (Pearson reads LINEAR association and one
  * outlier owns it; Spearman is outlier-immune and detects any
  * monotone link). Per returnflag: ρ_s between line quantity and
  * extended price — "do bigger lines cost more, monotonically?".
  *
  * Exactness discipline: average-tie ranks are carried DOUBLED so
  * ties stay integral (rank2 = 2·min_rank + (tie_count − 1)); the
  * five Pearson sums over rank2 accumulate in DECIMAL — exact and
  * order-free where a long Σxy overflows at the sf1 decade
  * (n·(2n)² ≈ 1.4e19 > 2⁶³ — measured motive, not caution); ρ is ONE
  * fixed double tree over the EXACT sums (each sum cast to double
  * once, then combined — the n·Σxy − ΣxΣy cross terms would need
  * 39-digit decimals, past both engines' width; the doubling
  * cancels). Constant columns (zero rank variance) → NULL ρ (stated).
  *
  * Scale shape: two group-partitioned rank windows (per-group local
  * sorts — the X8 percentile economics) + one map-side groupBy to
  * |groups| rows. At 100 TB the rank windows take the q149 two-level
  * value-bucket swap, same as every exact rank statistic here.
  */
object SpearmanCorrelation {

  /** q230 — per-flag Spearman of (quantity, extendedprice). */
  val q230 = GraftQuery(
    "q230_spearman", {
      (s, d) => {
        val base = t(s, d, "lineitem").select(
          col("l_returnflag").as("g"),
          col("l_quantity").as("x"), col("l_extendedprice").as("y"))
        def rank2(c: String) = {
          val byVal = Window.partitionBy(col("g")).orderBy(col(c))
          val tie = Window.partitionBy(col("g"), col(c))
          (rank().over(byVal).cast("long") * 2 +
            count(lit(1)).over(tie) - 1)
            .cast(DecimalType(18, 0))
        }
        val ranked = base
          .withColumn("rx", rank2("x"))
          .withColumn("ry", rank2("y"))
        val sums = ranked.groupBy(col("g"))
          .agg(count(lit(1)).cast(DecimalType(18, 0)).as("n"),
            sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
            sum(col("rx") * col("rx")).as("sxx"),
            sum(col("ry") * col("ry")).as("syy"),
            sum(col("rx") * col("ry")).as("sxy"))
        def dd(c: String) = col(c).cast("double")
        sums.select(col("g"), col("n").cast("long").as("n_rows"),
            (dd("n") * dd("sxy") - dd("sx") * dd("sy")).as("num"),
            (dd("n") * dd("sxx") - dd("sx") * dd("sx")).as("dx"),
            (dd("n") * dd("syy") - dd("sy") * dd("sy")).as("dy"))
          .withColumn("spearman",
            when(col("dx") > 0 && col("dy") > 0,
              col("num") / sqrt(col("dx") * col("dy"))))
          .select(col("g"), col("n_rows"), col("spearman"))
          .orderBy(col("g"))
      }
    },
    Some("""
      WITH base AS (
        SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y
        FROM lineitem),
      ranked AS (
        SELECT g,
               CAST(RANK() OVER (PARTITION BY g ORDER BY x) * 2
                 + COUNT(*) OVER (PARTITION BY g, x) - 1
                 AS DECIMAL(18,0)) AS rx,
               CAST(RANK() OVER (PARTITION BY g ORDER BY y) * 2
                 + COUNT(*) OVER (PARTITION BY g, y) - 1
                 AS DECIMAL(18,0)) AS ry
        FROM base),
      sums AS (
        SELECT g, CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
               SUM(rx) AS sx, SUM(ry) AS sy,
               SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
               SUM(rx * ry) AS sxy
        FROM ranked GROUP BY g)
      SELECT g, CAST(n AS BIGINT) AS n_rows,
             CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                   AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                 sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             END AS spearman
      FROM sums
      ORDER BY g
    """))

  val all: Seq[GraftQuery] = Seq(q230)
}
