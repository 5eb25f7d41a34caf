package graft.operators

/** Shared χ²(0.95, df) critical values, df = 1..12, embedded as
  * literals (the X147/X197 discipline: critical values are constants
  * of the test, not data — both engines compare against the identical
  * literal). [[KruskalWallis]] predates this object and keeps its
  * local copy with the same values; new df-indexed tests key off this
  * one. The CASE builders end in an explicit raise_error/error() (the
  * q247 ADVICE-r18 convention) so a df past the table fails loudly on
  * BOTH engines instead of returning a silent NULL verdict.
  */
private[operators] object ChiSqCrit {

  val Crit950: Seq[Double] = Seq(3.841458820694124, 5.991464547107979,
    7.814727903251179, 9.487729036781154, 11.070497693516351,
    12.591587243743977, 14.067140449340165, 15.507313055865446,
    16.918977604620444, 18.307038053275143, 19.675137572682488,
    21.026069817483055)

  /** Spark SQL CASE over `dfExpr` (an integer df expression). */
  def sparkCase(dfExpr: String, who: String): String =
    Crit950.zipWithIndex
      .map { case (c, i) => s"WHEN $dfExpr = ${i + 1} THEN ${c}d" }
      .mkString("CASE ", " ",
        s" ELSE raise_error('$who: df exceeds the embedded chi-square" +
          s" table (df <= ${Crit950.size}) — extend ChiSqCrit') END")

  /** DuckDB mirror of [[sparkCase]]. */
  def duckCase(dfExpr: String, who: String): String =
    Crit950.zipWithIndex
      .map { case (c, i) => s"WHEN $dfExpr = ${i + 1} THEN $c" }
      .mkString("CASE ", " ",
        s" ELSE CAST(error('$who: df out of table') AS DOUBLE) END")

  /** z(0.95), the one-sided 95 % normal point the Wilson–Hilferty
    * cube rides on.
    */
  private val Z95 = 1.6448536269514722

  private def wh(dfExpr: String): String =
    s"($dfExpr) * pow(1.0 - 2.0 / (9.0 * ($dfExpr)) + $Z95 " +
      s"* sqrt(2.0 / (9.0 * ($dfExpr))), 3.0)"

  /** Like [[sparkCase]] but UNBOUNDED df: the exact table through
    * df 12, then the Wilson–Hilferty (1931) cube-root approximation
    * χ²(0.95, df) ≈ df·(1 − 2/(9df) + z·√(2/(9df)))³ — one closed
    * double tree, identical on both engines, within 0.12 % of the
    * exact quantile for df ≥ 3 (and the table covers everything
    * below). For data-dependent strata counts (months, entities)
    * where a loud error would make scale itself the failure.
    */
  def sparkCaseWh(dfExpr: String): String =
    Crit950.zipWithIndex
      .map { case (c, i) => s"WHEN $dfExpr = ${i + 1} THEN ${c}d" }
      .mkString("CASE ", " ", s" ELSE ${wh(dfExpr)} END")

  /** DuckDB mirror of [[sparkCaseWh]]. */
  def duckCaseWh(dfExpr: String): String =
    Crit950.zipWithIndex
      .map { case (c, i) => s"WHEN $dfExpr = ${i + 1} THEN $c" }
      .mkString("CASE ", " ", s" ELSE ${wh(dfExpr)} END")
}
