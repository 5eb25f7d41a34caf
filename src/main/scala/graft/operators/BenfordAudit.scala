package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X114 — Benford first-significant-digit audit: the classic
  * fabricated-numbers detector (Benford 1938; Nigrini's forensic
  * accounting practice) applied where a training-data pipeline needs
  * it — monetary/count columns whose digit distribution suddenly
  * deviating from log₁₀(1+1/d) flags synthetic padding, unit bugs
  * (×100 scaling shifts mass), or a generator replacing a real feed.
  * Complements X87's profile (nulls/cardinality) with a
  * DISTRIBUTIONAL-shape alarm that needs no reference snapshot.
  *
  * Determinism: the first digit is extracted from the STRING render of
  * the exact integer cents (decimal(18,2)·100 → BIGINT — bigint
  * rendering is identical across engines; rendering the raw double
  * would not be), expected probabilities are shared 15-digit literals
  * (log₁₀(1+1/d) is transcendental — frozen literals, not engine
  * ln()), each deviation (o−np)²/(np) is one shared double tree over
  * exact longs, and χ² is a FIXED-ORDER 9-term sum over pivoted
  * per-digit columns (never a float groupBy sum).
  *
  * Scale shape: one map-side-combined groupBy to the ≤9-row digit
  * frame; everything after runs on that planning frame joined with the
  * 1-row total. χ²(8) critical value 15.507 at α=0.05.
  */
object BenfordAudit {

  /** log₁₀(1 + 1/d), frozen to shared literals. */
  val P: Seq[Double] = Seq(
    0.301029995663981, 0.176091259055681, 0.124938736608300,
    0.096910013008056, 0.079181246047625, 0.066946789630613,
    0.057991946977687, 0.051152522447381, 0.045757490560675)

  /** χ²(8 dof) at α = 0.05. */
  val Crit = 15.507

  /** The audit over a frame of positive exact integers (column `c`):
    * per-digit observed/expected counts, deviations, fixed-order χ²,
    * and the verdict.
    */
  /** First-digit extraction as a pure-integer comparison/division
    * ladder (no per-row string render — that allocation measured
    * exponent 0.61 vs the 0.31 scan bound at the 60M-row decade; the
    * ladder is branch-predictable codegen). The SQL mirror builds the
    * same CASE from the same powers, so the integers are identical by
    * construction.
    */
  private val Pow10: Seq[Long] =
    (0 to 18).map(i => BigInt(10).pow(i).toLong)

  private def firstDigit(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (1 to 17).foldLeft(when(c < Pow10(1), c)) { (acc, i) =>
      acc.when(c < Pow10(i + 1), expr(s"c div ${Pow10(i)}"))
    }.otherwise(expr(s"c div ${Pow10(18)}")).cast("int")

  /** The same ladder in DuckDB SQL (interpolated into oracles). */
  def firstDigitSql(col: String): String =
    (1 to 17).map(i =>
      s"WHEN $col < ${Pow10(i + 1)} THEN $col // ${Pow10(i)}")
      .mkString(s"CASE WHEN $col < 10 THEN $col ",
        " ", s" ELSE $col // ${Pow10(18)} END")

  def audit(ints: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val digits = ints.select(firstDigit(col("c")).as("digit"))
    val obs = digits.groupBy(col("digit"))
          .agg(count(lit(1)).as("obs"))
        val tot = obs.agg(sum(col("obs")).as("n"))
        val per = obs.join(broadcast(tot))
          .withColumn("p", element_at(
            array(P.map(lit): _*), col("digit")))
          .withColumn("expd", col("n").cast("double") * col("p"))
          .withColumn("dev",
            (col("obs").cast("double") - col("expd")) *
              (col("obs").cast("double") - col("expd")) / col("expd"))
        // fixed-order χ²: pivot the ≤9 deviations to one row and add
        // them in digit order — identical op order to the oracle
        val devCols = (1 to 9).map(dg =>
          max(when(col("digit") === dg, col("dev"))).as(s"d$dg"))
        val chi = per.agg(devCols.head, devCols.tail: _*)
          .select((1 to 9).map(dg => coalesce(col(s"d$dg"), lit(0.0d)))
            .reduce(_ + _).as("chi2"))
        per.join(broadcast(chi))
          .select(col("digit"), col("obs"),
            round(col("expd"), 2).as("exp_r"),
            round(col("dev"), 6).as("dev_r"),
            round(col("chi2"), 6).as("chi2_r"),
            (col("chi2") < Crit).as("benford_ok"))
          .orderBy(col("digit"))
  }

  /** q159 — Benford audit of l_extendedprice (as exact cents). */
  val q159 = GraftQuery(
    "q159_benford_audit", {
      (s, d) =>
        audit(t(s, d, "lineitem").select(
          (dec(col("l_extendedprice")) * 100).cast("long").as("c")))
    },
    Some(s"""
      WITH cents AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS c
        FROM lineitem),
      digits AS (
        SELECT CAST(${firstDigitSql("c")} AS INTEGER) AS digit
        FROM cents),
      obs AS (SELECT digit, COUNT(*) AS obs FROM digits GROUP BY 1),
      tot AS (SELECT SUM(obs) AS n FROM obs),
      probs(digit, p) AS (VALUES
        ${P.zipWithIndex.map { case (p, i) =>
          s"(${i + 1}, CAST($p AS DOUBLE))" }.mkString(", ")}),
      per AS (
        SELECT o.digit, o.obs, t.n, pr.p,
               CAST(t.n AS DOUBLE) * pr.p AS expd,
               (CAST(o.obs AS DOUBLE) - CAST(t.n AS DOUBLE) * pr.p)
                 * (CAST(o.obs AS DOUBLE) - CAST(t.n AS DOUBLE) * pr.p)
                 / (CAST(t.n AS DOUBLE) * pr.p) AS dev
        FROM obs o CROSS JOIN tot t JOIN probs pr ON pr.digit = o.digit),
      chi AS (
        SELECT ${(1 to 9).map(dg =>
          s"COALESCE(MAX(CASE WHEN digit = $dg THEN dev END), 0.0)")
          .mkString(" + ")} AS chi2
        FROM per)
      SELECT per.digit, per.obs, round(per.expd, 2) AS exp_r,
             round(per.dev, 6) AS dev_r, round(chi.chi2, 6) AS chi2_r,
             chi.chi2 < $Crit AS benford_ok
      FROM per CROSS JOIN chi
      ORDER BY per.digit
    """))

  val all: Seq[GraftQuery] = Seq(q159)
}
