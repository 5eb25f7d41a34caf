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
}
