package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The text-feature definitions shared by the standalone analysis
  * queries (q47/q48) and the prep-pipeline composition (q62) — ONE
  * source for the marker regexes, the language decision, and the
  * quality formula, in both Column and oracle-SQL form, so the
  * individual queries and the composed pipeline cannot drift apart.
  */
private[operators] object TextFeatures {

  /** Stopword-marker regex per language; decision priority is list
    * order (en > es > de > fr > und).
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|of|and|to|is)\\b",
    "es" -> "\\b(el|los|las|una|es)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(les|une|est|dans|pour)\\b")

  /** Adds `score_<lang>` marker-count columns over `normCol`. */
  def withLangScores(df: DataFrame, normCol: Column): DataFrame =
    langMarkers.foldLeft(df) { case (acc, (l, pat)) =>
      acc.withColumn(s"score_$l", regexp_count(normCol, lit(pat)))
    }

  /** The 4-branch language decision over the `score_*` columns. */
  def predicted: Column = {
    val Seq(en, es, de, fr) = langMarkers.map(m => col("score_" + m._1))
    when(en > 0 && en >= es && en >= de && en >= fr, "en")
      .when(es > 0 && es >= de && es >= fr, "es")
      .when(de > 0 && de >= fr, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** DuckDB mirror of [[withLangScores]]: the score_* select list. */
  def langScoresSql(normExpr: String): String =
    langMarkers.map { case (l, pat) =>
      s"CAST(len(regexp_extract_all($normExpr, '$pat')) AS INTEGER) AS score_$l"
    }.mkString(",\n               ")

  /** DuckDB mirror of [[predicted]]. */
  val predictedSql: String =
    """CASE
                 WHEN score_en > 0 AND score_en >= score_es
                      AND score_en >= score_de AND score_en >= score_fr THEN 'en'
                 WHEN score_es > 0 AND score_es >= score_de
                      AND score_es >= score_fr THEN 'es'
                 WHEN score_de > 0 AND score_de >= score_fr THEN 'de'
                 WHEN score_fr > 0 THEN 'fr'
                 ELSE 'und'
               END"""

  /** Composite quality score: length saturation × punctuation penalty. */
  def quality(nWords: Column, punctRatio: Column): Column =
    round(least(lit(1.0), nWords.cast("double") / 50) *
      (lit(1.0) - punctRatio), 4)

  /** DuckDB mirror of [[quality]]. */
  def qualitySql(nWordsExpr: String, punctExpr: String): String =
    s"round(least(1.0, CAST($nWordsExpr AS DOUBLE) / 50) * (1.0 - $punctExpr), 4)"

  /** DuckDB mirror of
    * [[graft.functions.expressions.WordFingerprint]] over a normalized
    * text expression — shared by q62 and the q87 funnel so the two
    * oracles cannot drift from each other (or from the expression).
    */
  def fingerprintSql(normExpr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split($normExpr, ' '),
                   w -> CAST(length(w) * 17 + ascii(w) * 31
                             + ascii(reverse(w)) AS BIGINT))),
                 (acc, v) -> (acc * 31 + v) % 1000000007)"""
}
