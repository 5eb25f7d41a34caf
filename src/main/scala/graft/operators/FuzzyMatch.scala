package graft.operators

import org.apache.spark.sql.functions._

import Q._

import graft.functions.expressions.DamerauLevenshtein

/** X155 — typo-tolerant name matching on the native unrestricted
  * Damerau-Levenshtein expression (Damerau CACM 1964 for the error
  * model, Lowrance & Wagner JACM 1975 for the distance; kernel + the
  * Spark-core static-call codegen pattern in
  * `functions/expressions/DamerauLevenshtein.scala`): surface catalog
  * rows whose names are within τ edits — X137's entity resolution
  * links records sharing an exact TOKEN; this is the tier below it,
  * where the token itself is misspelled ("widgte" for "widget"), which
  * exact-token blocking can never see. X74's edit-verify is plain
  * Levenshtein on winnowing candidates; transpositions — the dominant
  * human typo class — cost 2 there and 1 here.
  *
  * Shape: the pair face is blocked on (brand, type) exactly like X137
  * — Σ per-block k², bounded by the attribute domain, never all-pairs
  * — then gated by the FREE length filter |len(a)−len(b)| ≤ τ (a
  * length difference is ≥ that many inserts, so the gate is lossless;
  * it runs in codegen before any DP) and only then scored by the
  * O(len²) kernel inside whole-stage codegen. At 100 TB the block key
  * is the partition key and each block's face is executor-local.
  *
  * Determinism: the distance is an exact int; output is the matched
  * pair set ordered by key — hash-exact against DuckDB's
  * `damerau_levenshtein` (same unrestricted variant, verified on the
  * CA→ABC=2 witness that separates it from OSA).
  */
object FuzzyMatch {

  /** Max edits for a match. */
  val Tau = 3

  /** q196 — within-block name pairs at Damerau-Levenshtein ≤ τ. */
  val q196 = GraftQuery(
    "q196_fuzzy_match", {
      (s, d) => {
        val p = t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_name"))
        // r19 optimization (guide §2.5/§3.3): the probe side of this
        // blocked face must carry the FACE's parallelism, not the
        // input's. |part| fits one 128 MB scan split, so the broadcast
        // join evaluated the whole Σ_block k² kernel face in ONE task
        // (measured 2.69 s solo at sf0.1, ~2.7M kernel calls on one
        // core). Repartitioning the probe side by p_partkey
        // (deterministic, evenly spread, scale-adaptive via
        // spark.sql.shuffle.partitions) costs one |part|-row exchange —
        // negligible against the k² face at any scale — and spreads
        // the kernel across the session's cores. Build side unchanged
        // (still broadcast). Identical output rows. The partition count
        // is pinned (REPARTITION_BY_NUM) because AQE sizes partitions
        // by SHUFFLE BYTES — 20 k probe rows coalesce right back to one
        // partition even though each row fans out k-fold in the join
        // (measured: the unpinned form stayed at 2.7 s solo).
        p.repartition(
            s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("p_partkey")).as("a")
          .join(p.as("b"),
            col("a.p_brand") === col("b.p_brand") &&
              col("a.p_type") === col("b.p_type") &&
              col("a.p_partkey") < col("b.p_partkey"))
          .filter(abs(length(col("a.p_name")) - length(col("b.p_name")))
            <= Tau)
          .withColumn("dl",
            DamerauLevenshtein(col("a.p_name"), col("b.p_name")))
          .filter(col("dl") <= Tau)
          .select(col("a.p_partkey").as("key_a"),
            col("b.p_partkey").as("key_b"),
            col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
            col("a.p_brand").as("brand"), col("dl"))
          .orderBy(col("key_a"), col("key_b"))
      }
    },
    Some(s"""
      WITH p AS (SELECT p_partkey, p_brand, p_type, p_name FROM part)
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             a.p_name AS name_a, b.p_name AS name_b,
             a.p_brand AS brand,
             CAST(damerau_levenshtein(a.p_name, b.p_name) AS INTEGER)
               AS dl
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_type = b.p_type
       AND a.p_partkey < b.p_partkey
      WHERE abs(length(a.p_name) - length(b.p_name)) <= $Tau
        AND damerau_levenshtein(a.p_name, b.p_name) <= $Tau
      ORDER BY key_a, key_b
    """))

  val all: Seq[GraftQuery] = Seq(q196)
}
