package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Q._

/** X199 — phonetic blocking keys for entity resolution (Russell's
  * Soundex, 1918 patent; the canonical phonetic code of Knuth TAOCP
  * vol. 3 §6): map each name token to LETTER + 3 DIGITS so that
  * spelling variants of the same sound ("SMITH"/"SMYTH" → S530)
  * land in one block — the RECALL-oriented sibling of X137's exact
  * token blocking (which only pairs identical tokens) and X155's
  * Damerau–Levenshtein verify (which only repairs small EDITS;
  * "CATHERINE"/"KATHRYN" is edit-distance 4 but one phonetic block).
  *
  * The code is the repo's PINNED VARIANT, identical Column ops and
  * SQL on both engines (Spark's builtin `soundex` is deliberately NOT
  * used — its H/W edge-case semantics would make the oracle chase an
  * engine implementation): uppercase; keep the first letter; map all
  * letters through the standard digit table (vowels+H+W+Y → 0);
  * collapse runs of each digit (RE2-safe per-digit replaces — no
  * backreferences); strip zeros; drop the leading digit when it is
  * the first letter's own code; take 3 digits zero-padded. The
  * classic "H/W transparent between same-code consonants" nuance is
  * intentionally out (stated — it needs lookahead RE2 lacks, and for
  * blocking it only merges a hair more).
  *
  * q235 audits the blocking key over part-name tokens: per code, the
  * block census (parts, distinct tokens, the colliding token range)
  * and `cross_token_pairs` — the candidate pairs phonetic blocking
  * ADDS over exact-token blocking (total within-block pairs minus
  * within-token pairs, exact integers): the recall budget a linkage
  * run buys by switching keys, before any verify cost is spent.
  *
  * Scale shape: per-row codegen'd string ops (translate + 6 literal
  * regexp_replaces), one map-side groupBy to the (code, token) frame,
  * one to the |codes| census. Scan-bound; the blocking JOIN this key
  * feeds is X137's machinery unchanged.
  */
object PhoneticBlocking {

  private val Letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Codes = "01230120022455012623010202"

  /** The pinned Soundex-class code of a single token column. */
  def code(c: Column): Column = {
    val up = upper(c)
    val mapped = translate(up, Letters, Codes)
    val collapsed = (1 to 6).foldLeft(mapped) { (m, d) =>
      regexp_replace(m, s"$d{2,}", d.toString)
    }
    val noZero = regexp_replace(collapsed, "0", "")
    val firstCode = translate(substring(up, 1, 1), Letters, Codes)
    val rest = when(firstCode === "0", noZero)
      .otherwise(substring(noZero, 2, 3))
    concat(substring(up, 1, 1), rpad(substring(rest, 1, 3), 3, "0"))
  }

  /** DuckDB mirror of [[code]], parameterized on the token expr. */
  def codeSql(e: String): String = {
    val mapped = s"translate(upper($e), '$Letters', '$Codes')"
    val collapsed = (1 to 6).foldLeft(mapped) { (m, d) =>
      s"regexp_replace($m, '$d{2,}', '$d', 'g')"
    }
    val noZero = s"regexp_replace($collapsed, '0', '', 'g')"
    val firstCode = s"translate(substr(upper($e), 1, 1), " +
      s"'$Letters', '$Codes')"
    s"substr(upper($e), 1, 1) || rpad(substr(" +
      s"CASE WHEN $firstCode = '0' THEN $noZero " +
      s"ELSE substr($noZero, 2, 3) END, 1, 3), 3, '0')"
  }

  /** q235 — phonetic-block census over part-name first tokens. */
  val q235 = GraftQuery(
    "q235_phonetic_blocking", {
      (s, d) => {
        val byTok = t(s, d, "part")
          .select(split(col("p_name"), " ").getItem(0).as("tok"))
          .withColumn("code", code(col("tok")))
          .groupBy(col("code"), col("tok"))
          .agg(count(lit(1)).as("c"))
        byTok.groupBy(col("code"))
          .agg(sum(col("c")).as("n_parts"),
            count(lit(1)).as("n_tokens"),
            min(col("tok")).as("tok_min"),
            max(col("tok")).as("tok_max"),
            expr("sum(c * (c - 1) div 2)").as("within_tok_pairs"))
          .withColumn("cross_token_pairs",
            expr("n_parts * (n_parts - 1) div 2 - within_tok_pairs"))
          .select(col("code"), col("n_parts"), col("n_tokens"),
            col("tok_min"), col("tok_max"), col("cross_token_pairs"))
          .orderBy(col("code"))
      }
    },
    Some(s"""
      WITH toks AS (
        SELECT string_split(p_name, ' ')[1] AS tok FROM part),
      coded AS (
        SELECT tok, ${codeSql("tok")} AS code FROM toks),
      by_tok AS (
        SELECT code, tok, COUNT(*) AS c
        FROM coded GROUP BY 1, 2)
      SELECT code, CAST(SUM(c) AS BIGINT) AS n_parts,
             COUNT(*) AS n_tokens,
             MIN(tok) AS tok_min, MAX(tok) AS tok_max,
             CAST(SUM(c) * (SUM(c) - 1) // 2
               - SUM(c * (c - 1) // 2) AS BIGINT) AS cross_token_pairs
      FROM by_tok
      GROUP BY code
      ORDER BY code
    """))

  val all: Seq[GraftQuery] = Seq(q235)
}
