package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Q._

/** X109 — Z-order (Morton) clustering: the MULTI-column data-skipping
  * layout ([[graft.sources.Warehouse.writeSortedByRange]] buys range
  * skips on ONE column; a 100 TB fact table is filtered on several).
  * Interleaving the bits of two bucketed column ranks makes every
  * z-contiguous file cover a small RECTANGLE of the (a, b) space, so
  * parquet min/max row-group stats skip files for predicates on
  * EITHER column — the layout behind Delta/Iceberg's OPTIMIZE ZORDER
  * (Morton 1966).
  *
  * Determinism: bucket ranks are floor((v − lo)·(2¹⁶−1)/(hi − lo))
  * over broadcast exact bounds — one shared double tree, then floor;
  * the interleave is pure integer arithmetic ((rank div 2ⁱ) % 2
  * placed at bit 2i+1 / 2i — `div` both engines, operands
  * non-negative so truncation ≡ floor), so the z key is
  * oracle-checkable bit-for-bit.
  *
  * Scale shape: the z key is one map-side expression; the layout
  * write is repartitionByRange(z) + sortWithinPartitions(z) — one
  * range-exchange, the same cost as the single-column sorted write it
  * replaces. ZOrderSpec measures the payoff structurally: per-file
  * spans on BOTH columns shrink vs a single-column sort, and a
  * two-sided box predicate prunes most files via row-group stats.
  */
object ZOrderClustering {

  /** Bits per dimension (two dims → a 32-bit z key). */
  val Bits = 16

  private val Max = (1L << Bits) - 1

  /** Bucket rank of `v` over broadcast [lo, hi] bounds columns. */
  private def rank(v: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L)).otherwise(
      least(lit(Max), greatest(lit(0L),
        floor((v - lo) * Max / (hi - lo)).cast("long"))))

  /** Morton interleave of two [0, 2¹⁶) rank COLUMNS (by name) — a's
    * bits land on odd positions, b's on even.
    */
  def morton(a: String, b: String): Column =
    (0 until Bits).map { i =>
      expr(s"(($a div ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"(($b div ${1L << i}) % 2) * ${1L << (2 * i)}")
    }.reduce(_ + _)

  /** (ranked frame with `za`/`zb` bucket ranks and the `z` key) for
    * columns (a, b) of `df` — bounds computed once and broadcast.
    */
  def withZ(df: DataFrame, a: String, b: String): DataFrame = {
    val bounds = df.agg(
      min(col(a).cast("double")).as("loa"),
      max(col(a).cast("double")).as("hia"),
      min(col(b).cast("double")).as("lob"),
      max(col(b).cast("double")).as("hib"))
    df.join(broadcast(bounds))
      .withColumn("za", rank(col(a).cast("double"), col("loa"), col("hia")))
      .withColumn("zb", rank(col(b).cast("double"), col("lob"), col("hib")))
      .withColumn("z", morton("za", "zb"))
      .drop("loa", "hia", "lob", "hib")
  }

  /** Write `df` z-ordered on (a, b): range-partitioned and sorted by
    * the z key, so every file covers a compact z run — a small
    * rectangle of the (a, b) space.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      partitions: Int): Unit =
    withZ(df, a, b)
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("za", "zb", "z")
      .write.mode("overwrite").parquet(path)

  /** q156 — the z key oracle-checked bit-for-bit on a lineitem slice:
    * bucket ranks and the interleaved key for (l_partkey, l_suppkey).
    */
  val q156 = GraftQuery(
    "q156_zorder_key", {
      (s, d) => {
        val li = t(s, d, "lineitem").filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"))
        withZ(li, "l_partkey", "l_suppkey")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("za"), col("zb"), col("z"))
          // (orderkey, linenumber) ties exist in the synthetic data —
          // the ORDER BY must be total for the hash compare
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"))
      }
    },
    Some(s"""
      WITH src AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        FROM lineitem WHERE l_orderkey < 100),
      bounds AS (
        SELECT min(CAST(l_partkey AS DOUBLE)) AS loa,
               max(CAST(l_partkey AS DOUBLE)) AS hia,
               min(CAST(l_suppkey AS DOUBLE)) AS lob,
               max(CAST(l_suppkey AS DOUBLE)) AS hib
        FROM src),
      ranked AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               CASE WHEN hia = loa THEN 0 ELSE
                 least($Max, greatest(0, CAST(floor(
                   (CAST(l_partkey AS DOUBLE) - loa) * $Max / (hia - loa))
                   AS BIGINT))) END AS za,
               CASE WHEN hib = lob THEN 0 ELSE
                 least($Max, greatest(0, CAST(floor(
                   (CAST(l_suppkey AS DOUBLE) - lob) * $Max / (hib - lob))
                   AS BIGINT))) END AS zb
        FROM src, bounds)
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, za, zb,
             ${(0 until Bits).map(i =>
               s"((za // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
                 s"((zb // ${1L << i}) % 2) * ${1L << (2 * i)}")
               .mkString(" + ")} AS z
      FROM ranked
      ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey
    """))

  val all: Seq[GraftQuery] = Seq(q156)
}
