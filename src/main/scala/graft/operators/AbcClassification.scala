package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** X178 — ABC / Pareto classification (the 80/15/5 inventory rule;
  * Pareto 1896, Dickie's 1951 ABC formulation): rank parts by exact
  * lifetime revenue, classify by CUMULATIVE share — A carries the
  * first 80 % of revenue, B to 95 %, C the tail — and report the
  * class census: part counts, revenue, and the boundary ranks. The
  * working-capital census next to X102's Gini (X102 reports HOW
  * concentrated; this hands back WHICH tier each item sits in, the
  * actionable cut a stocking/retention policy keys on).
  *
  * Determinism: revenue is the exact DECIMAL discSum; the class test
  * is prefix·100 < 80·total compared IN DECIMAL (no division, no
  * float boundary); ranking and cumulation run over the total
  * (revenue desc, partkey) order. A row is classed by the share of
  * everything BEFORE it (exclusive prefix), so the row that CROSSES
  * a boundary belongs to the higher class — the textbook rule, and
  * the one that keeps a single dominant item in A even when it alone
  * exceeds 80 % (an inclusive compare would put the top seller in C).
  *
  * Scale shape: one map-side lineitem groupBy → |parts| dimension
  * frame; the prefix/rank windows run on THAT frame (the q187/q214
  * discipline); census = one groupBy to 3 rows.
  */
object AbcClassification {

  /** q216 — the ABC census over part revenue. */
  val q216 = GraftQuery(
    "q216_abc_classification", {
      (s, d) => {
        // r19 optimization (VERDICT r18 item-1 class, the q214/q219
        // conversion pattern): the former global rank + running-sum +
        // total windows funneled the |parts|-growing revenue frame
        // through ONE partition. Now: checkpoint the per-part rollup
        // once, then the two-level bucketed prefix swap — rank and
        // inclusive running sum each as bucket partials + a ≤1025-row
        // offsets broadcast + bucket-PARTITIONED windows — and the
        // total as a 1-row aggregate broadcast. rk is cast back to
        // int (row_number's type) and the decimal prefix sums are
        // exact in any grouping order, so the classification is
        // bit-identical.
        val rev = graft.Checkpoints.eager(t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("partkey"))
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .as("rev")))
        // Fused swap: rank and running sum share the SAME total order,
        // so one bucket pass + one offsets frame carrying BOTH the
        // count prefix and the revenue prefix + one bucket-partitioned
        // window stage serves both (two RankSum.* calls in sequence
        // measured 2.1× the fused form's stage count at sf0.1).
        val bucketed = RankSum.withRangeBucket(rev,
          negate(col("rev")).cast("double"))
        // exclusive prefixes as inclusive-minus-own: never NULL (no
        // empty frame), so no type-coercing coalesce on the decimal
        val wb = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = bucketed.groupBy(col("bkt"))
          .agg(count(lit(1)).as("bn"), sum(col("rev")).as("bs"))
          .withColumn("offN", sum(col("bn")).over(wb) - col("bn"))
          .withColumn("offS", sum(col("bs")).over(wb) - col("bs"))
          .select(col("bkt"), col("offN"), col("offS"))
        val wv = Window.partitionBy(col("bkt"))
          .orderBy(col("rev").desc, col("partkey"))
        val total = rev.agg(sum(col("rev")).as("total"))
        val classed = bucketed
          .join(broadcast(offsets), "bkt")
          .withColumn("rk",
            (col("offN") + row_number().over(wv)).cast("int"))
          .withColumn("cum", col("offS") + sum(col("rev")).over(
            wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .join(broadcast(total))
          .withColumn("prefix", col("cum") - col("rev"))
          .withColumn("cls",
            when(col("prefix") * 100 < col("total") * 80, "A")
              .otherwise(when(col("prefix") * 100 < col("total") * 95,
                "B").otherwise("C")))
        classed.groupBy(col("cls"))
          .agg(count(lit(1)).as("n_parts"),
            min(col("rk")).as("first_rank"),
            max(col("rk")).as("last_rank"),
            sum(col("rev")).cast("double").as("revenue"))
          .orderBy(col("cls"))
      }
    },
    Some("""
      WITH rev AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (CAST(1 AS DECIMAL(18,2)) -
                    CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM lineitem GROUP BY 1),
      ranked AS (
        SELECT partkey, rev,
               ROW_NUMBER() OVER (ORDER BY rev DESC, partkey) AS rk,
               SUM(rev) OVER (ORDER BY rev DESC, partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum,
               SUM(rev) OVER () AS total
        FROM rev),
      classed AS (
        SELECT rk, rev,
               CASE WHEN (cum - rev) * 100 < total * 80 THEN 'A'
                    WHEN (cum - rev) * 100 < total * 95 THEN 'B'
                    ELSE 'C' END AS cls
        FROM ranked)
      SELECT cls, COUNT(*) AS n_parts,
             CAST(MIN(rk) AS INTEGER) AS first_rank,
             CAST(MAX(rk) AS INTEGER) AS last_rank,
             CAST(SUM(rev) AS DOUBLE) AS revenue
      FROM classed
      GROUP BY cls
      ORDER BY cls
    """))

  val all: Seq[GraftQuery] = Seq(q216)
}
