package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X248 — Hurst exponent by rescaled-range analysis (Hurst 1951;
  * Mandelbrot & Wallis 1969) of each event type's hourly-volume
  * series: the LONG-MEMORY dial the lag-local tier can't read —
  * q276's DW sees lag 1, q233's Ljung–Box a fixed band; H measures
  * how the rescaled range R/S GROWS with window length (R/S ∝ n^H),
  * separating persistent load (H > ½ — busy hours beget busy hours,
  * capacity must plan for long excursions) from mean-reverting noise
  * (H ≈ ½) without picking a lag. Estimate: mean R/S over disjoint
  * blocks of 8/16/32/64 hours, then the OLS slope of ln(R/S̄) on
  * ln(block size).
  *
  * Determinism: within a block of exact integer counts, B·Wⱼ =
  * B·Pⱼ − j·P_B is an exact long, so R/S = (max−min of those)/
  * √(B·Σx² − P_B²) is ONE double tree per block (the B's cancel);
  * block means ride DECIMAL(30,14) lanes; the regression collapses to
  * H = Σ_B w_B·ln(R/S̄_B) because the ln(B) design points are fixed —
  * w_B = (ln B − mean)/Σ(·)² = (−1.5,−0.5,0.5,1.5)/(5·ln 2), spliced
  * as the SAME shortest-repr double literals into both engines (CAST
  * AS DOUBLE in SQL); the 4 weighted terms sum on decimal lanes.
  * Degenerate blocks (zero variance) are excluded — stated; a type
  * missing any of the four sizes → NULL H.
  *
  * Scale shape: one corpus pass to the |types × hours| census; the
  * hour index, block prefix sums and block totals are windows
  * PARTITIONED by (type[, size, block]) on that dimension frame (the
  * 4× size fan-out is a 4-row broadcast cross join); folds are
  * ≤|types × 4| planning frames. Corpus touched once.
  */
object HurstExponent {

  private val Sizes = Seq(8, 16, 32, 64)

  /** (ln B − mean ln B)/Σ(ln B − mean)² for B = 8,16,32,64. */
  private val WeightByB: Seq[(Int, Double)] = {
    val ln2 = math.log(2.0)
    Seq(8 -> (-1.5 / (5.0 * ln2)), 16 -> (-0.5 / (5.0 * ln2)),
      32 -> (0.5 / (5.0 * ln2)), 64 -> (1.5 / (5.0 * ln2)))
  }

  private def wCaseSpark: String =
    WeightByB.map { case (b, w) => s"WHEN bsz = $b THEN ${w}d" }
      .mkString("CASE ", " ", " END")

  private def wCaseDuck: String =
    WeightByB.map { case (b, w) =>
      s"WHEN bsz = $b THEN CAST($w AS DOUBLE)" }
      .mkString("CASE ", " ", " END")

  /** q275 — per-type R/S Hurst exponent of hourly event volume. */
  val q275 = GraftQuery(
    "q275_hurst_exponent", {
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            floor(unix_timestamp(date_trunc("hour", col("ts"))) /
              lit(3600.0d)).cast("long").as("h"))
          .agg(count(lit(1)).as("x"))
        val wIdx = Window.partitionBy(col("g")).orderBy(col("h"))
        val indexed = hourly
          .withColumn("idx", row_number().over(wIdx).cast("long"))
        val sizes = { import s.implicits._; Sizes.toDF("bsz") }
        val framed = indexed.join(broadcast(sizes))
          .withColumn("blk", expr("(idx - 1) div bsz"))
          .withColumn("j", pmod(col("idx") - 1L, col("bsz")) + 1L)
        val wBlk = Window.partitionBy(col("g"), col("bsz"), col("blk"))
        val wRun = wBlk.orderBy(col("j"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val enriched = framed
          .withColumn("bn", count(lit(1)).over(wBlk))
          .filter(col("bn") === col("bsz"))
          .withColumn("p", sum(col("x")).over(wRun))
          .withColumn("pb", sum(col("x")).over(wBlk))
          .withColumn("sxx", sum(col("x") * col("x")).over(wBlk))
          .withColumn("q",
            col("bsz") * col("p") - col("j") * col("pb"))
        val perBlock = enriched
          .groupBy(col("g"), col("bsz"), col("blk"))
          .agg((max(col("q")) - min(col("q"))).as("rng"),
            (max(col("sxx")) * col("bsz") - max(col("pb")) *
              max(col("pb"))).as("dvar"))
          .filter(col("dvar") > 0L)
          .withColumn("rs",
            col("rng").cast("double") /
              sqrt(col("dvar").cast("double")))
        val perSize = perBlock.groupBy(col("g"), col("bsz"))
          .agg(count(lit(1)).as("nblk"),
            (sum(col("rs").cast("decimal(30,14)")).cast("double") /
              count(lit(1))).as("mean_rs"))
        perSize
          .withColumn("term", expr(wCaseSpark) * log(col("mean_rs")))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n_sizes"),
            sum(col("term").cast("decimal(30,14)")).cast("double")
              .as("hsum"),
            max(when(col("bsz") === 8, round(col("mean_rs"), 6)))
              .as("rs8_r"),
            max(when(col("bsz") === 64, round(col("mean_rs"), 6)))
              .as("rs64_r"))
          .withColumn("h",
            when(col("n_sizes") === 4L, round(col("hsum"), 6)))
          .select(col("g").as("event_type"), col("n_sizes"),
            col("rs8_r"), col("rs64_r"), col("h").as("h_r"),
            (col("h") > 0.5d).as("persistent"))
          .orderBy(col("event_type"))
      }
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type AS g,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600
                 AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      indexed AS (
        SELECT g, x,
               CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY h)
                 AS BIGINT) AS idx
        FROM hourly),
      framed AS (
        SELECT g, x, idx, bsz,
               (idx - 1) // bsz AS blk,
               (idx - 1) % bsz + 1 AS j
        FROM indexed
        CROSS JOIN (SELECT unnest([${Sizes.mkString(", ")}]) AS bsz) z),
      enriched AS (
        SELECT g, bsz, blk, j, x,
               COUNT(*) OVER (PARTITION BY g, bsz, blk) AS bn,
               SUM(x) OVER (PARTITION BY g, bsz, blk ORDER BY j
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS p,
               SUM(x) OVER (PARTITION BY g, bsz, blk) AS pb,
               SUM(x * x) OVER (PARTITION BY g, bsz, blk) AS sxx
        FROM framed),
      perblock AS (
        SELECT g, bsz, blk,
               MAX(bsz * p - j * pb) - MIN(bsz * p - j * pb) AS rng,
               MAX(sxx) * bsz - MAX(pb) * MAX(pb) AS dvar
        FROM enriched
        WHERE bn = bsz
        GROUP BY g, bsz, blk),
      persize AS (
        SELECT g, bsz, COUNT(*) AS nblk,
               CAST(SUM(CAST(CAST(rng AS DOUBLE)
                 / sqrt(CAST(dvar AS DOUBLE)) AS DECIMAL(30,14)))
                 AS DOUBLE) / COUNT(*) AS mean_rs
        FROM perblock
        WHERE dvar > 0
        GROUP BY g, bsz),
      folded AS (
        SELECT g, COUNT(*) AS n_sizes,
               CAST(SUM(CAST(($wCaseDuck) * ln(mean_rs)
                 AS DECIMAL(30,14))) AS DOUBLE) AS hsum,
               MAX(CASE WHEN bsz = 8 THEN round(mean_rs, 6) END)
                 AS rs8_r,
               MAX(CASE WHEN bsz = 64 THEN round(mean_rs, 6) END)
                 AS rs64_r
        FROM persize GROUP BY g)
      SELECT g AS event_type, n_sizes, rs8_r, rs64_r,
             CASE WHEN n_sizes = 4 THEN round(hsum, 6) END AS h_r,
             CASE WHEN n_sizes = 4 THEN round(hsum, 6) END
               > CAST(0.5 AS DOUBLE) AS persistent
      FROM folded
      ORDER BY event_type
    """))

  val all: Seq[GraftQuery] = Seq(q275)
}
