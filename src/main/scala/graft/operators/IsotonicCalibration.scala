package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X130 — isotonic calibration (pool-adjacent-violators fit): the
  * non-parametric score→probability map (Zadrozny & Elkan KDD'02,
  * Robertson et al.'s minimax characterization) that X115's ECE audit
  * measures the NEED for — where a parametric temperature (X93) can't
  * fix a non-monotone reliability curve, isotonic regression fits the
  * best monotone one. Solution computed by the closed minimax form
  * iso_i = max_{j≤i} min_{k≥i} avg(y over bins j..k) — algebraically
  * identical to running PAVA, and expressible as plain joins/aggs.
  *
  * Shape: the corpus contributes ONE map-side-combined groupBy to the
  * ≤100-bin frame; the O(B²) pair frame and the O(B³)-ish minimax
  * join run entirely on that planning frame (≤ ~170k tiny rows — the
  * same corpus-work-vs-planning-frame split as X114/X115). At 100 TB
  * nothing after the first groupBy sees corpus cardinality.
  *
  * Determinism: the model score is the frozen §7.4 LCG mock (REDUCED
  * before multiplied — the r11 overflow rule; a real score column
  * drops into the same plan), bins by integer division, prefix sums
  * exact longs, each segment average ONE division of exact longs
  * (IEEE-identical), min/max over identical doubles identical.
  */
object IsotonicCalibration {

  /** Score bins (score ∈ [0, 1e6) → bin = score div 1e4). */
  val Bins = 100

  /** The minimax isotonic fit over an aggregated bin frame (bin, n,
    * pos): iso_i = max_{j≤i} min_{k≥i} avg(pos/n over bins j..k).
    * Split out from q172 so planted violator sequences can be checked
    * against a literal driver-side PAVA run.
    */
  def fit(bins: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = bins
      .withColumn("cp", sum(col("pos")).over(w))
      .withColumn("cn", sum(col("n")).over(w))
    val pairs = cum.select(col("bin").as("j"),
      (col("cp") - col("pos")).as("pbase"),
      (col("cn") - col("n")).as("nbase"))
      .join(cum.select(col("bin").as("k"), col("cp"), col("cn")),
        col("k") >= col("j"))
      .select(col("j"), col("k"),
        ((col("cp") - col("pbase")).cast("double") /
          (col("cn") - col("nbase")).cast("double")).as("seg_avg"))
    val iso = bins.select(col("bin"))
      .join(pairs, col("j") <= col("bin") && col("k") >= col("bin"))
      .groupBy(col("bin"), col("j"))
      .agg(min(col("seg_avg")).as("mn"))
      .groupBy(col("bin"))
      .agg(max(col("mn")).as("iso_rate"))
    bins.join(iso, "bin")
      .select(col("bin"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double"))
          .as("raw_rate"),
        col("iso_rate"))
  }

  /** q172 — isotonic fit of finished-order rate vs the mock score. */
  val q172 = GraftQuery(
    "q172_isotonic_calibration", {
      (s, d) => {
        val scored = t(s, d, "orders").select(
          expr("((o_orderkey % 1000003) * 1103515245 + 12345) % 1000000")
            .as("score"),
          when(col("o_orderstatus") === "F", lit(1L)).otherwise(lit(0L))
            .as("y"))
        val bins = scored.groupBy(expr("score div 10000").as("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
        fit(bins).orderBy(col("bin"))
      }
    },
    Some("""
      WITH scored AS (
        SELECT ((o_orderkey % 1000003) * 1103515245 + 12345) % 1000000
                 AS score,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      bins AS (
        SELECT score // 10000 AS bin, COUNT(*) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM scored GROUP BY 1),
      cum AS (
        SELECT bin, n, pos,
               CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cp,
               CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn
        FROM bins),
      pairs AS (
        SELECT c1.bin AS j, c2.bin AS k,
               CAST(c2.cp - (c1.cp - c1.pos) AS DOUBLE)
                 / CAST(c2.cn - (c1.cn - c1.n) AS DOUBLE) AS seg_avg
        FROM cum c1 JOIN cum c2 ON c2.bin >= c1.bin),
      iso AS (
        SELECT bin, MAX(mn) AS iso_rate FROM (
          SELECT b.bin, p.j, MIN(p.seg_avg) AS mn
          FROM bins b JOIN pairs p ON p.j <= b.bin AND p.k >= b.bin
          GROUP BY 1, 2)
        GROUP BY 1)
      SELECT b.bin, b.n, b.pos,
             CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS raw_rate,
             i.iso_rate
      FROM bins b JOIN iso i ON i.bin = b.bin
      ORDER BY b.bin
    """))

  val all: Seq[GraftQuery] = Seq(q172)
}
