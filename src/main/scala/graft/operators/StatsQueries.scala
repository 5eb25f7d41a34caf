package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X90/X91/X92 — the statistics tier a data-pipeline dashboard sits
  * on: distributed Poisson-bootstrap confidence intervals, a CUSUM
  * changepoint detector over event rates, and a two-proportion A/B
  * lift test. Three operators, one discipline: every random-looking
  * quantity derives from the q73 LCG recipe (identical integer
  * arithmetic both engines), every float is produced by one shared
  * expression tree, sums that must be exact run in DECIMAL.
  */
object StatsQueries {

  // ---------------------------------------------------------------- X90

  /** Bootstrap replicates. */
  val Reps = 100

  /** Deterministic Poisson(1) weights: cumulative-probability
    * thresholds e⁻¹·Σ 1/k! scaled to the LCG's 10⁶ grid. P(0)=.367879,
    * P(≤1)=.735759, P(≤2)=.919699, P(≤3)=.980958, P(≤4)=.996286.
    */
  private val PoissonCdf = Seq(367879L, 735759L, 919699L, 980958L, 996286L)

  /** q140 — Poisson-bootstrap 95 % CI for the mean event value.
    *
    * The at-scale bootstrap (Poisson resampling — each row joins
    * replicate r with weight w ~ Poisson(1), independently derivable
    * per (row, r) WITHOUT global coordination; the classic
    * approximation to multinomial resampling used by every
    * map-reduce-era bootstrap, cf. Chamandy et al., "Estimating
    * uncertainty for massive data streams", Google TR 2012): one
    * explode to R weighted copies, decimal-exact weighted sums per
    * replicate, CI from the order statistics of the R replicate
    * means. Scale shape: the map-side combine collapses each
    * partition to ≤ R partial rows before the one shuffle (R rows
    * total); the order-statistics window runs on the R-row frame.
    *
    * r19 optimization (guide §2.3 "aggregate before you shuffle",
    * taken to its limit): the LCG input depends on the event row ONLY
    * through g = pmod(event_id·R, 10⁶) — and because R = 100 divides
    * 10⁶, g has at most 10⁴ distinct values. Every event in residue
    * class g draws the SAME weight w(g, rep) for every replicate, so
    *   Σ_rows value·w  =  Σ_g w(g,rep) · Σ_{rows in g} value
    *   Σ_rows w        =  Σ_g w(g,rep) · |rows in g|
    * exactly: decimal addition is order-free and w is an integer, so
    * the per-replicate sums (and therefore the means, ranks and CI)
    * are bit-identical to the row-level explode. The corpus-sized
    * stage shrinks from R·|events| generated rows (the explode) to ONE
    * map-side-combinable hash aggregate into ≤10⁴ groups; the R-fold
    * replicate expansion then runs over the ≤10⁴-row group frame
    * (≤10⁶ tiny rows, corpus-independent). A replicate is absent from
    * repMeans exactly when all its weights are zero — the same
    * condition in both forms, since w never varies within a class.
    */
  val q140 = GraftQuery(
    "q140_bootstrap_ci", {
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_id"), col("value"))
        // pre-mod before the LCG multiply: (id·R + rep) can reach
        // ~1e15 at petabyte row counts and ·1103515245 would overflow
        // long (caught LIVE by the sf10 decade probe at id ~1e8);
        // reducing to the 10^6 grid first bounds the product at
        // ~1.1e15 for ANY id. Applied here at the class key so the
        // per-(g, rep) LCG below matches the per-(row, rep) original:
        // pmod(id·R + rep, 10⁶) = pmod(pmod(id·R, 10⁶) + rep, 10⁶).
        val byClass = ev
          .groupBy(pmod(col("event_id") * Reps, lit(1000000L)).as("g"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("sval"),
            count(lit(1)).as("cnt"))
        val weighted = byClass
          .select(col("g"), col("sval"), col("cnt"),
            explode(sequence(lit(0), lit(Reps - 1))).as("rep"))
          .withColumn("u", pmod(
            pmod(col("g") + col("rep"), lit(1000000L))
              * 1103515245L + 12345L,
            lit(1000000L)))
          .withColumn("w",
            when(col("u") < PoissonCdf(0), 0L)
              .when(col("u") < PoissonCdf(1), 1L)
              .when(col("u") < PoissonCdf(2), 2L)
              .when(col("u") < PoissonCdf(3), 3L)
              .when(col("u") < PoissonCdf(4), 4L)
              .otherwise(5L))
          .filter(col("w") > 0)
        // w ∈ [1,5] ⇒ decimal(1,0): sval(28,2)·w → decimal(30,2),
        // summed → decimal(38,2), the SAME final type (and exact
        // value) the row-level sum of value(18,2)·w produced.
        val repMeans = weighted.groupBy(col("rep"))
          .agg((sum(col("sval") * col("w").cast("decimal(1,0)"))
            .cast("double") /
            sum(col("cnt") * col("w")).cast("double")).as("m"))
        val wr = Window.orderBy(col("m"), col("rep"))
        val ranked = repMeans.withColumn("rk", row_number().over(wr))
        // 95% CI: order statistics 3 and 98 of 100 replicate means
        val lo = ranked.filter(col("rk") === 3)
          .select(round(col("m"), 4).as("ci_lo_r"))
        val hi = ranked.filter(col("rk") === 98)
          .select(round(col("m"), 4).as("ci_hi_r"))
        val point = ev.agg(
          (sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("mean"),
          count(lit(1)).as("n"))
          .select(col("n"), round(col("mean"), 4).as("mean_r"))
        point.join(lo).join(hi)
          .select(col("n"), col("mean_r"), col("ci_lo_r"), col("ci_hi_r"))
      }
    },
    Some(s"""
      WITH weighted AS (
        SELECT rep, value,
               CASE
                 WHEN u < ${PoissonCdf(0)} THEN 0
                 WHEN u < ${PoissonCdf(1)} THEN 1
                 WHEN u < ${PoissonCdf(2)} THEN 2
                 WHEN u < ${PoissonCdf(3)} THEN 3
                 WHEN u < ${PoissonCdf(4)} THEN 4
                 ELSE 5 END AS w
        FROM (
          SELECT e.event_id, e.value, r.rep,
                 ((e.event_id * $Reps + r.rep) % 1000000
                   * 1103515245 + 12345) % 1000000 AS u
          FROM events e
          CROSS JOIN (SELECT unnest(generate_series(0, ${Reps - 1}))
                      AS rep) r)),
      repmeans AS (
        SELECT rep,
               CAST(sum(CAST(value AS DECIMAL(18,2)) * w) AS DOUBLE)
                 / CAST(sum(w) AS DOUBLE) AS m
        FROM weighted WHERE w > 0 GROUP BY rep),
      ranked AS (
        SELECT m, ROW_NUMBER() OVER (ORDER BY m, rep) AS rk
        FROM repmeans),
      pt AS (
        SELECT count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 4) AS mean_r
        FROM events)
      SELECT pt.n, pt.mean_r,
             (SELECT round(m, 4) FROM ranked WHERE rk = 3) AS ci_lo_r,
             (SELECT round(m, 4) FROM ranked WHERE rk = 98) AS ci_hi_r
      FROM pt
    """))

  // ---------------------------------------------------------------- X91

  /** q141 — CUSUM changepoint detection over hourly event rates.
    *
    * The one-sided CUSUM s_t = max(0, s_{t-1} + x_t − k) rewritten to
    * its WINDOW form — s_t = (P_t − k·t) − min_{j≤t}(P_j − k·j) with
    * P the prefix sum — so the recursion becomes two running windows
    * instead of a sequential fold (Page 1954's statistic, the Spark
    * shape). With k = the global mean rate, everything scales by the
    * hour count m into pure integers: y_t·m = m·P_t − T·t (T total
    * events), alarm when s_t·m > h·m with h = 2·k (i.e. 2·T). The
    * windows run over the HOURS frame (planning-tier sized — q129's
    * |dumps| precedent), not the corpus; the only corpus-sized work
    * is the hourly count agg.
    */
  val q141 = GraftQuery(
    "q141_cusum_changepoint", {
      (s, d) => {
        val hours = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))
        val wOrd = Window.orderBy(col("hour"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        hours
          .withColumn("t", row_number().over(wOrd).cast("long"))
          .withColumn("p", sum(col("n")).over(wRun))
          .join(hours.agg(sum(col("n")).as("total"),
            count(lit(1)).as("m")))
          // scaled deviation y·m = m·P_t − T·t (exact longs)
          .withColumn("ym", col("m") * col("p") - col("total") * col("t"))
          .withColumn("cusum_m", col("ym") - min(col("ym")).over(wRun))
          .withColumn("alarm", col("cusum_m") > lit(2L) * col("total"))
          .select(col("hour"), col("n"),
            (col("cusum_m").cast("double") / col("m").cast("double"))
              .as("cusum"),
            col("alarm"))
          .orderBy(col("hour"))
      }
    },
    Some("""
      WITH hours AS (
        SELECT date_trunc('hour', ts) AS hour, count(*) AS n
        FROM events GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                     count(*) AS m FROM hours),
      seq AS (
        SELECT hour, n,
               CAST(ROW_NUMBER() OVER (ORDER BY hour) AS BIGINT) AS t,
               CAST(sum(n) OVER (ORDER BY hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS p
        FROM hours),
      dev AS (
        SELECT s.hour, s.n, tot.total, tot.m,
               tot.m * s.p - tot.total * s.t AS ym
        FROM seq s CROSS JOIN tot),
      cs AS (
        SELECT hour, n, total, m,
               ym - min(ym) OVER (ORDER BY hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cusum_m
        FROM dev)
      SELECT hour, n, CAST(cusum_m AS DOUBLE) / CAST(m AS DOUBLE)
               AS cusum,
             cusum_m > 2 * total AS alarm
      FROM cs
      ORDER BY hour
    """))

  // ---------------------------------------------------------------- X92

  /** q142 — two-proportion A/B lift test on high-value purchase
    * conversion.
    *
    * Arms by the deterministic user_id parity; conversion = the user
    * produced ≥1 purchase with value > 200 (the un-saturated event —
    * plain "any purchase", and any low cut, converges to p = 1 on
    * this corpus's ~8 purchases/user, collapsing the pooled variance
    * to zero; a degenerate arm still fails loudly via ANSI
    * divide-by-zero rather than reporting a NaN z). The z statistic is the pooled
    * two-proportion form, computed by ONE expression tree shared with
    * the oracle (counts are exact ints, each ratio one IEEE division,
    * the pooled variance and sqrt identical op order) — the q133
    * argument: bit-identical inputs + identical tree = hash-safe
    * rounding. Scale: two map-side agg passes over (user, flag)
    * pairs; the test itself runs on a 2-row frame.
    */
  val q142 = GraftQuery(
    "q142_ab_lift_test", {
      (s, d) => {
        val users = t(s, d, "events")
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 200.0d, 1L).otherwise(0L)).as("converted"))
          .withColumn("arm", pmod(col("user_id"), lit(2L)))
        val arms = users.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
        val a = arms.filter(col("arm") === 0)
          .select(col("n").as("n0"), col("c").as("c0"))
        val b = arms.filter(col("arm") === 1)
          .select(col("n").as("n1"), col("c").as("c1"))
        a.join(b)
          .withColumn("p0", col("c0").cast("double") / col("n0").cast("double"))
          .withColumn("p1", col("c1").cast("double") / col("n1").cast("double"))
          .withColumn("pp", (col("c0") + col("c1")).cast("double") /
            (col("n0") + col("n1")).cast("double"))
          .withColumn("z", (col("p1") - col("p0")) /
            sqrt(col("pp") * (lit(1.0d) - col("pp")) *
              (lit(1.0d) / col("n0").cast("double") +
                lit(1.0d) / col("n1").cast("double"))))
          .select(col("n0"), col("c0"), col("n1"), col("c1"),
            round(col("p0"), 4).as("p0_r"), round(col("p1"), 4).as("p1_r"),
            round(col("p1") - col("p0"), 4).as("lift_r"),
            round(col("z"), 4).as("z_r"),
            (abs(col("z")) > 1.96d).as("significant"))
      }
    },
    Some("""
      WITH users AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND value > 200.0
                 THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1),
      arms AS (
        SELECT user_id % 2 AS arm, count(*) AS n,
               CAST(sum(converted) AS BIGINT) AS c
        FROM users GROUP BY 1),
      wide AS (
        SELECT
          (SELECT n FROM arms WHERE arm = 0) AS n0,
          (SELECT c FROM arms WHERE arm = 0) AS c0,
          (SELECT n FROM arms WHERE arm = 1) AS n1,
          (SELECT c FROM arms WHERE arm = 1) AS c1),
      stat AS (
        SELECT n0, c0, n1, c1,
               CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
               CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
               CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS pp
        FROM wide)
      SELECT n0, c0, n1, c1,
             round(p0, 4) AS p0_r, round(p1, 4) AS p1_r,
             round(p1 - p0, 4) AS lift_r,
             round((p1 - p0) / sqrt(pp * (1.0 - pp) *
               (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 4)
               AS z_r,
             abs((p1 - p0) / sqrt(pp * (1.0 - pp) *
               (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))))
               > 1.96 AS significant
      FROM stat
    """))

  val all: Seq[GraftQuery] = Seq(q140, q141, q142)
}
