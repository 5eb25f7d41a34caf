package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X189 — discount-lift audit (the promo-effectiveness read; the
  * observational cousin of X50's CUPED experiment machinery): per
  * brand, line volume and quantity across discount bands, and the
  * LIFT of each discounted band's mean quantity-per-line over the
  * same brand's undiscounted baseline — "does 6–10 % off actually
  * move more units of this brand, or just give margin away?". The
  * merchandising sibling of X178: ABC says which items carry
  * revenue, this says whether price moves them.
  *
  * Exactness: band cuts are exact decimal compares on the RAW
  * discount column; quantities sum in DECIMAL; the lift is ONE fixed
  * double tree from exact values — (sum_b · n_0) / (n_b · sum_0),
  * products taken in double after exact casts — with a NULL guard
  * when the brand has no baseline lines (stated, not a
  * divide-by-zero). Observational caveat documented: this is a
  * conditional-mean report, not a causal estimate — X50 is the
  * experiment path.
  *
  * Scale shape: one map-side lineitem⋈part join pruned to two
  * columns (FK exchange shared with every brand rollup), one
  * map-side census to |brands × bands| cells, a self-join of that
  * dimension frame against its band-0 slice.
  */
object DiscountLift {

  /** q226 — brand × discount-band quantity lift. */
  val q226 = GraftQuery(
    "q226_discount_lift", {
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "part").select(col("p_partkey"),
            col("p_brand").as("brand")),
            col("l_partkey") === col("p_partkey"))
          .withColumn("band",
            when(dec(col("l_discount")) < dec(lit(0.02)), "a_none")
              .otherwise(when(dec(col("l_discount")) < dec(lit(0.06)),
                "b_low")
                .otherwise(when(dec(col("l_discount")) < dec(lit(0.11)),
                  "c_mid").otherwise("d_deep"))))
        val cells = li.groupBy(col("brand"), col("band"))
          .agg(count(lit(1)).as("n_lines"),
            sum(dec(col("l_quantity"))).as("qty"))
        val base = cells.filter(col("band") === "a_none")
          .select(col("brand"), col("n_lines").as("n0"),
            col("qty").as("q0"))
        cells.join(base, Seq("brand"), "left")
          .withColumn("mean_qty",
            col("qty").cast("double") / col("n_lines").cast("double"))
          .withColumn("lift_vs_none",
            when(col("band") === "a_none", 1.0d)
              .otherwise(when(col("n0").isNotNull && col("q0") > 0,
                (col("qty").cast("double") * col("n0").cast("double")) /
                  (col("n_lines").cast("double") *
                    col("q0").cast("double")))))
          .select(col("brand"), col("band"), col("n_lines"),
            col("qty").cast("double").as("qty"), col("mean_qty"),
            col("lift_vs_none"))
          .orderBy(col("brand"), col("band"))
      }
    },
    Some("""
      WITH li AS (
        SELECT p.p_brand AS brand,
               CAST(l.l_quantity AS DECIMAL(18,2)) AS qty,
               CASE WHEN CAST(l.l_discount AS DECIMAL(18,2))
                      < CAST(0.02 AS DECIMAL(18,2)) THEN 'a_none'
                    WHEN CAST(l.l_discount AS DECIMAL(18,2))
                      < CAST(0.06 AS DECIMAL(18,2)) THEN 'b_low'
                    WHEN CAST(l.l_discount AS DECIMAL(18,2))
                      < CAST(0.11 AS DECIMAL(18,2)) THEN 'c_mid'
                    ELSE 'd_deep' END AS band
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      cells AS (
        SELECT brand, band, COUNT(*) AS n_lines, SUM(qty) AS qty
        FROM li GROUP BY 1, 2),
      base AS (
        SELECT brand, n_lines AS n0, qty AS q0
        FROM cells WHERE band = 'a_none')
      SELECT c.brand, c.band, c.n_lines,
             CAST(c.qty AS DOUBLE) AS qty,
             CAST(c.qty AS DOUBLE) / CAST(c.n_lines AS DOUBLE)
               AS mean_qty,
             CASE WHEN c.band = 'a_none' THEN 1.0
                  WHEN b.n0 IS NOT NULL AND b.q0 > 0 THEN
                    (CAST(c.qty AS DOUBLE) * CAST(b.n0 AS DOUBLE)) /
                    (CAST(c.n_lines AS DOUBLE) * CAST(b.q0 AS DOUBLE))
             END AS lift_vs_none
      FROM cells c LEFT JOIN base b ON b.brand = c.brand
      ORDER BY c.brand, c.band
    """))

  val all: Seq[GraftQuery] = Seq(q226)
}
