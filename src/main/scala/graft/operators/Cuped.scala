package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X97 — CUPED variance-reduced A/B analysis (Deng, Xu, Kohavi & Walker,
  * WSDM 2013 "Improving the Sensitivity of Online Controlled
  * Experiments by Utilizing Pre-Experiment Data"): the standard
  * experimentation-platform upgrade over the plain X92 lift — each
  * user's experiment-period metric y is adjusted by their
  * PRE-period metric x, ŷ = y − θ(x − x̄) with θ = cov(x,y)/var(x),
  * removing the between-user variance that x explains; the same lift
  * is measured with var(ŷ)/var(y) = 1 − ρ² of the noise, so
  * experiments need ~1/(1−ρ²) fewer users.
  *
  * Determinism (the q74 exact-moment discipline): the time split is an
  * integer-µs midpoint ((min+max) div 2); per-user x/y are DECIMAL
  * sums (exact, associative); every moment (Σx, Σy, Σxy, Σx², Σy²) is
  * a decimal power sum cast to double ONCE; θ, the adjusted arm
  * means, and ρ² are then one expression tree shared with the oracle
  * — bit-identical inputs + identical op order, the q133/q142
  * argument.
  *
  * Scale shape: two map-side-combined agg passes (per-user decimal
  * x/y; then the global + per-arm moments over the users frame) — the
  * users frame is the only shuffle, the analysis runs on a 3-row
  * frame. CUPED itself adds ZERO passes over raw events vs the plain
  * lift: x comes from the same scan that builds y.
  */
object Cuped {

  /** q146 — CUPED-adjusted lift on per-user event value (pre-period =
    * first half of the corpus time range, experiment = second half,
    * arms = user parity).
    */
  val q146 = GraftQuery(
    "q146_cuped_ab", {
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("value"),
            unix_micros(col("ts")).as("us"))
        val mid = ev.agg(
          expr("(min(us) + max(us)) div 2").as("mid"))
        val users = ev.join(broadcast(mid))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("us") < col("mid"),
              col("value").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)"))).as("x"),
            sum(when(col("us") >= col("mid"),
              col("value").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)"))).as("y"))
          .withColumn("arm", pmod(col("user_id"), lit(2L)))
        val g = users.agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"))
        val arms = users.groupBy(col("arm")).agg(
          count(lit(1)).cast("double").as("na"),
          sum(col("x")).cast("double").as("sxa"),
          sum(col("y")).cast("double").as("sya"))
        val a0 = arms.filter(col("arm") === 0)
          .select(col("na").as("n0"), col("sxa").as("sx0"),
            col("sya").as("sy0"))
        val a1 = arms.filter(col("arm") === 1)
          .select(col("na").as("n1"), col("sxa").as("sx1"),
            col("sya").as("sy1"))
        g.join(a0).join(a1)
          .withColumn("xbar", col("sx") / col("n"))
          .withColumn("covxy",
            (col("sxy") - col("sx") * col("sy") / col("n")) / col("n"))
          .withColumn("varx",
            (col("sxx") - col("sx") * col("sx") / col("n")) / col("n"))
          .withColumn("vary",
            (col("syy") - col("sy") * col("sy") / col("n")) / col("n"))
          .withColumn("theta", col("covxy") / col("varx"))
          .withColumn("lift_raw",
            col("sy1") / col("n1") - col("sy0") / col("n0"))
          .withColumn("lift_cuped",
            (col("sy1") / col("n1") - col("theta") *
              (col("sx1") / col("n1") - col("xbar"))) -
              (col("sy0") / col("n0") - col("theta") *
                (col("sx0") / col("n0") - col("xbar"))))
          .withColumn("rho2", col("covxy") * col("covxy") /
            (col("varx") * col("vary")))
          .select(col("n0").cast("long").as("n0"),
            col("n1").cast("long").as("n1"),
            round(col("theta"), 4).as("theta_r"),
            round(col("lift_raw"), 4).as("lift_raw_r"),
            round(col("lift_cuped"), 4).as("lift_cuped_r"),
            round(col("rho2"), 4).as("var_reduction_r"))
      }
    },
    Some("""
      WITH ev AS (
        SELECT user_id, value, epoch_us(ts) AS us FROM events),
      mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
      users AS (
        SELECT user_id, user_id % 2 AS arm,
               sum(CASE WHEN us < mid THEN CAST(value AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
               sum(CASE WHEN us >= mid THEN CAST(value AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
        FROM ev CROSS JOIN mid
        GROUP BY user_id),
      g AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y * y) AS DOUBLE) AS syy
        FROM users),
      arms AS (
        SELECT arm, CAST(count(*) AS DOUBLE) AS na,
               CAST(sum(x) AS DOUBLE) AS sxa,
               CAST(sum(y) AS DOUBLE) AS sya
        FROM users GROUP BY arm),
      wide AS (
        SELECT g.*,
          (SELECT na FROM arms WHERE arm = 0) AS n0,
          (SELECT sxa FROM arms WHERE arm = 0) AS sx0,
          (SELECT sya FROM arms WHERE arm = 0) AS sy0,
          (SELECT na FROM arms WHERE arm = 1) AS n1,
          (SELECT sxa FROM arms WHERE arm = 1) AS sx1,
          (SELECT sya FROM arms WHERE arm = 1) AS sy1
        FROM g),
      st AS (
        SELECT n0, n1,
               sx / n AS xbar,
               (sxy - sx * sy / n) / n AS covxy,
               (sxx - sx * sx / n) / n AS varx,
               (syy - sy * sy / n) / n AS vary,
               sx0, sy0, sx1, sy1
        FROM wide),
      fin AS (
        SELECT n0, n1, covxy / varx AS theta, xbar,
               sy1 / n1 - sy0 / n0 AS lift_raw,
               (sy1 / n1 - (covxy / varx) * (sx1 / n1 - xbar))
                 - (sy0 / n0 - (covxy / varx) * (sx0 / n0 - xbar))
                 AS lift_cuped,
               covxy * covxy / (varx * vary) AS rho2
        FROM st)
      SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             round(theta, 4) AS theta_r,
             round(lift_raw, 4) AS lift_raw_r,
             round(lift_cuped, 4) AS lift_cuped_r,
             round(rho2, 4) AS var_reduction_r
      FROM fin
    """))

  val all: Seq[GraftQuery] = Seq(q146)
}
