package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X172 — Count-Min sketch frequency estimation (Cormode &
  * Muthukrishnan, J. Algorithms 2005): d hash rows × w counters;
  * every key increments one counter per row, the estimate is the MIN
  * over its d counters — never an undercount, overcount ≤ εN with
  * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The fixed-memory
  * frequency tier next to X44 (HLL: how many DISTINCT) and X105
  * (Misra-Gries: WHICH keys are heavy, deterministic): CMS answers
  * point frequency queries for ANY key after one pass in d·w longs,
  * the shape that ships per-executor and merges by cell-wise + (the
  * property a 1000-executor count uses: partials merge without
  * re-scanning).
  *
  * The audit q211 builds the sketch AND the exact truth, reporting
  * per queried key the exact count, the estimate, and the overcount —
  * the calibration a team runs at small scale before trusting the
  * sketch at 100 TB. Everything is exact integer arithmetic on h60
  * md5 hashes (the X75/X156 idiom), so the DuckDB oracle replicates
  * the ENTIRE sketch bit-for-bit — a rare sketch with a hash-exact
  * oracle rather than a tolerance band, because its randomness is
  * pinned salts, not runtime entropy.
  *
  * Scale shape: one scan → a ×d explode into (row, bucket) pairs →
  * one map-side-combined groupBy to the ≤ d·w counter frame (the
  * sketch itself — broadcast-sized by construction); the exact top-k
  * truth is one more map-side groupBy + TakeOrdered; estimates join
  * the |queries|·d probe frame (broadcast) against the counter frame.
  * No shuffle grows with the corpus beyond the two partial-agg
  * exchanges.
  */
object CountMinSketch {

  /** Hash rows (d) and counters per row (w): ε = e/512 ≈ 0.0053. */
  val Depth = 4
  val Width = 512

  /** Audited keys: the top-k by exact frequency. */
  val TopKeys = 50

  // Built from Column operations (not expr-string splicing) so any
  // derived-column argument composes correctly into the plan.
  private def h60(k: Column, salt: String): Column =
    conv(substring(md5(concat(k.cast("string"), lit(":" + salt))), 1, 15),
      16, 10).cast("long")

  private def h60Sql(k: String, salt: String): String =
    s"CAST('0x' || substr(md5(concat(CAST($k AS VARCHAR), ':', '$salt'))" +
      s", 1, 15) AS BIGINT)"

  /** The (r, bucket, cnt) counter frame of the sketch over `keys`. */
  def sketch(keys: DataFrame): DataFrame = {
    val cells = array((0 until Depth).map { r =>
      struct(lit(r).as("r"),
        pmod(h60(col("k"), s"cms$r"), lit(Width.toLong)).as("bucket"))
    }: _*)
    keys.select(explode(cells).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sketch-vs-truth calibration over a single-column (k) frame:
    * partkey, rk, exact_cnt, cms_est, overcount for the top keys.
    */
  def calibrate(keys: DataFrame, topKeys: Int = TopKeys): DataFrame = {
    val counters = sketch(keys)
    // r19 optimization (the q239/q207 precedent): the former global
    // row_number window ranked EVERY distinct key on a single
    // partition — a |keys|-growing frame — then kept 50. limit()
    // compiles to the distributed TakeOrderedAndProject heap, and the
    // window ranks only the ≤topKeys survivors; ranks are identical
    // because the ordering (exact_cnt desc, k) is total.
    val exact = keys.groupBy(col("k")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("k")).limit(topKeys)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("exact_cnt").desc, col("k"))))
    val probes = exact.select(col("k"), col("exact_cnt"), col("rk"),
      explode(array((0 until Depth).map { r =>
        struct(lit(r).as("r"),
          pmod(h60(col("k"), s"cms$r"), lit(Width.toLong)).as("bucket"))
      }: _*)).as("cell"))
    probes
      .join(counters, probes("cell.r") === counters("r") &&
        probes("cell.bucket") === counters("bucket"))
      .groupBy(col("k"), col("exact_cnt"), col("rk"))
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("k").as("partkey"), col("rk"), col("exact_cnt"),
        col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("rk"))
  }

  /** q211 — sketch-vs-truth calibration for the top-50 partkeys. */
  val q211 = GraftQuery(
    "q211_count_min_sketch",
    (s, d) => calibrate(t(s, d, "lineitem").select(col("l_partkey").as("k"))),
    Some {
      val cellArms = (0 until Depth).map { r =>
        s"SELECT $r AS r, ${h60Sql("k", s"cms$r")} % $Width AS bucket " +
          "FROM keys"
      }.mkString(" UNION ALL ")
      val probeArms = (0 until Depth).map { r =>
        s"SELECT k, exact_cnt, rk, $r AS r, " +
          s"${h60Sql("k", s"cms$r")} % $Width AS bucket FROM exact"
      }.mkString(" UNION ALL ")
      s"""
      WITH keys AS (SELECT l_partkey AS k FROM lineitem),
      counters AS (
        SELECT r, bucket, COUNT(*) AS cnt
        FROM ($cellArms) GROUP BY r, bucket),
      exact AS (
        SELECT k, exact_cnt, rk FROM (
          SELECT k, COUNT(*) AS exact_cnt,
                 ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, k) AS rk
          FROM keys GROUP BY k)
        WHERE rk <= $TopKeys),
      probes AS ($probeArms)
      SELECT p.k AS partkey, CAST(p.rk AS INTEGER) AS rk, p.exact_cnt,
             CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
             CAST(MIN(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
      FROM probes p
      JOIN counters c ON c.r = p.r AND c.bucket = p.bucket
      GROUP BY p.k, p.rk, p.exact_cnt
      ORDER BY rk
    """
    })

  val all: Seq[GraftQuery] = Seq(q211)
}
