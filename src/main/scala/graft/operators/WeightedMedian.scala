package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X167 — exact weighted median / weighted quantiles (the
  * weighted-population form of X8's percentiles; Edgeworth 1888 is the
  * classic weighted-median reference): the price level at which half
  * the shipped QUANTITY sits below — "the median unit moved at this
  * price", which the row-median gets wrong whenever cheap lines carry
  * big quantities. The estimator behind volume-weighted SLAs,
  * expenditure medians, and token-weighted (not document-weighted)
  * corpus statistics: a corpus median document length weighted by
  * token count answers "the median TOKEN lives in a document this
  * long" — X162/X99-adjacent but weight-aware.
  *
  * Definition (deterministic lower weighted median): order rows by
  * (value, keys — a total order); the weighted q-quantile is the FIRST
  * row whose running weight Σw reaches q·W. Exactness: weights are
  * integral quantities summed as exact longs; the threshold test is
  * integer (cum·4 ≥ q4·W for q = q4/4 — no division anywhere); the
  * pick is a row_number over a total order.
  *
  * Shape: one group-partitioned ordered window (running weight — the
  * per-group sort IS the operator's irreducible cost, local per
  * group), a groupBy for W, one pick window per quantile; output =
  * |groups|·|quantiles| rows. At a 100 TB single group this takes the
  * q149 two-level swap (value-bucket partials, |buckets| prefix).
  */
object WeightedMedian {

  /** Quantiles in quarter units (1 = P25, 2 = median, 3 = P75). */
  val QuartersWanted = Seq(1, 2, 3)

  /** q206 — quantity-weighted price quartiles per returnflag. */
  val q206 = GraftQuery(
    "q206_weighted_median", {
      (s, d) => {
        val wOrd = Window.partitionBy(col("g"))
          .orderBy(col("price"), col("k1"), col("k2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("g"))
        val base = t(s, d, "lineitem")
          .select(col("l_returnflag").as("g"),
            col("l_extendedprice").as("price"),
            col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
            dec(col("l_quantity")).cast("long").as("w"))
          .withColumn("cum", sum(col("w")).over(wOrd))
          .withColumn("tot", sum(col("w")).over(wAll))
          .withColumn("n_rows", count(lit(1)).over(wAll))
        val perQ = QuartersWanted.map { q4 =>
          val pick = Window.partitionBy(col("g"))
            .orderBy(col("price"), col("k1"), col("k2"))
          base
            .filter(col("cum") * 4 >= lit(q4.toLong) * col("tot"))
            .withColumn("rn", row_number().over(pick))
            .filter(col("rn") === 1)
            .select(col("g"), lit(q4 * 25).as("pct"),
              col("price").as("value"), col("cum").as("weight_at"),
              col("tot").as("weight_total"), col("n_rows"))
        }
        perQ.reduce(_ unionByName _).orderBy(col("g"), col("pct"))
      }
    },
    Some {
      val arms = QuartersWanted.map { q4 =>
        s"""
      SELECT g, ${q4 * 25} AS pct, price AS value, cum AS weight_at,
             tot AS weight_total, n_rows
      FROM (
        SELECT g, price, cum, tot, n_rows,
               ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY price, k1, k2) AS rn
        FROM cum
        WHERE cum * 4 >= $q4 * tot)
      WHERE rn = 1"""
      }.mkString(" UNION ALL ")
      s"""
      WITH base AS (
        SELECT l_returnflag AS g, l_extendedprice AS price,
               l_orderkey AS k1, l_linenumber AS k2,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS w
        FROM lineitem),
      cum AS (
        SELECT g, price, k1, k2,
               CAST(SUM(w) OVER (PARTITION BY g ORDER BY price, k1, k2
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum,
               CAST(SUM(w) OVER (PARTITION BY g) AS BIGINT) AS tot,
               COUNT(*) OVER (PARTITION BY g) AS n_rows
        FROM base)
      SELECT * FROM ($arms)
      ORDER BY g, pct
    """
    })

  val all: Seq[GraftQuery] = Seq(q206)
}
