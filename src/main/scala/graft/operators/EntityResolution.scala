package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** X137 — entity resolution / record linkage over the part catalog
  * (the Fellegi-Sunter deterministic-rule tier): multiple listings of
  * the same product are consolidated into one entity — the structured
  * sibling of the text near-dup ladder (X15/X53 dedup DOCUMENTS by
  * content; this links RECORDS by attributes), and the step every
  * multi-source training corpus needs before per-entity aggregation
  * (star schemas count an entity twice if its listings never merge).
  *
  * Pipeline: BLOCK on (brand, type, name-token) — token blocking, the
  * standard recall-lossless cut: a record enters one block per token,
  * so every candidate pair shares a token by construction and the
  * pair face is output-bound (see [[matchEdges]]); MATCH = same
  * (brand, type) + ≥1 shared token (2-token names ⇒ name-jaccard ≥
  * 1/3); CLUSTER the match edges with X24's iterative closure (min-id
  * labels, (id, comp)-longs shuffles only); the oracle replays the
  * closure with the q68 recursive CTE.
  *
  * Determinism: blocking keys and token sets are exact strings; edges
  * are exact (a, b) key pairs; CC labels are min-ids — all integers;
  * cluster sizes exact counts. Nothing floats.
  */
object EntityResolution {

  /** Match edges: same (brand, type), ≥1 shared name token, a < b.
    *
    * Blocking key = (brand, type, TOKEN) — each record enters one
    * block per name token, so every candidate pair already shares a
    * token by construction and the pair face is OUTPUT-BOUND (Σ block
    * k² over token blocks ≈ the match count, ≤2× for two-token
    * names), not the (brand, type)-block k² face where most
    * candidates fail the token test (that formulation measured
    * exponent 1.19 on the catalog decade; this one is bounded by the
    * true duplicate structure — which genuinely grows when a
    * fixed-vocabulary catalog densifies, the honest floor for record
    * linkage). `distinct` collapses pairs that share both tokens.
    */
  def matchEdges(parts: DataFrame): DataFrame = {
    // empty tokens (from doubled/leading/trailing spaces) would act as
    // a universal match key inside a (brand, type) block and silently
    // over-merge — drop them (ADVICE r15; mirrored in the oracle CTE)
    val blocks = parts.select(col("p_partkey").as("key"),
      col("p_brand").as("brand"), col("p_type").as("ptype"),
      explode(split(col("p_name"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    blocks.as("a").join(blocks.as("b"),
      col("a.brand") === col("b.brand") &&
        col("a.ptype") === col("b.ptype") &&
        col("a.tok") === col("b.tok") &&
        col("a.key") < col("b.key"))
      .select(col("a.key").as("doc_a"), col("b.key").as("doc_b"))
      .distinct()
  }

  /** Every part labeled (p_partkey, entity_id, entity_size) — the
    * shared resolution pipeline under q178 and the capped q183.
    */
  def resolved(parts: DataFrame): DataFrame = {
    val edges = matchEdges(parts)
    val comp = ConnectedComponents.labels(edges)
    // singletons (no match edge) are their own entity
    val labeled = parts.select(col("p_partkey"))
      .join(comp, col("p_partkey") === col("id"), "left")
      .select(col("p_partkey"),
        coalesce(col("comp"), col("p_partkey")).as("entity_id"))
    val sizes = labeled.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("entity_size"))
    labeled.join(sizes, "entity_id")
  }

  /** Max listings per resolved entity before the merge is REJECTED
    * (r16, VERDICT r15 item 5): real record linkage bounds entity
    * size — a cluster beyond any plausible listing count is almost
    * always a generic-token artifact (blocking-key collapse), and
    * merging it poisons every per-entity aggregate downstream. Members
    * of an over-cap entity revert to singletons and are FLAGGED
    * (`overflow = true`) so the audit sees exactly what was refused
    * rather than silently absorbing it. 12 ≈ the observed honest
    * duplicate structure's upper band at sf0.01 (sizes run 1–24;
    * the tail past 12 is the densification artifact the r15 decade
    * probe measured growing ~quadratically).
    */
  val MaxEntitySize = 12

  /** Shared oracle CTE chain: blocking → pairs → recursive closure →
    * labels → sizes (q178 and q183 differ only in the final SELECT).
    */
  private val OracleCtes = """
      WITH RECURSIVE blocks0 AS (
        SELECT p_partkey AS key, p_brand AS brand, p_type AS ptype,
               unnest(string_split(p_name, ' ')) AS tok
        FROM part),
      blocks AS (SELECT * FROM blocks0 WHERE tok <> ''),
      pairs AS (
        SELECT DISTINCT a.key AS doc_a, b.key AS doc_b
        FROM blocks a JOIN blocks b
          ON a.brand = b.brand AND a.ptype = b.ptype
         AND a.tok = b.tok AND a.key < b.key),
      nodes AS (
        SELECT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src),
      comp AS (SELECT id, MIN(r) AS entity_id FROM reach GROUP BY 1),
      labeled AS (
        SELECT part.p_partkey,
               COALESCE(comp.entity_id, part.p_partkey) AS entity_id
        FROM part LEFT JOIN comp ON comp.id = part.p_partkey),
      sized AS (
        SELECT entity_id, COUNT(*) AS entity_size
        FROM labeled GROUP BY 1)"""

  /** q178 — every part labeled with its entity id + cluster stats. */
  val q178 = GraftQuery(
    "q178_entity_resolution", {
      (s: SparkSession, d: String) =>
        resolved(t(s, d, "part"))
          .select(col("p_partkey"), col("entity_id"), col("entity_size"),
            (col("p_partkey") === col("entity_id")).as("is_canonical"))
          .orderBy(col("p_partkey"))
    },
    Some(s"""$OracleCtes
      SELECT l.p_partkey, l.entity_id, s.entity_size,
             l.p_partkey = l.entity_id AS is_canonical
      FROM labeled l JOIN sized s USING (entity_id)
      ORDER BY l.p_partkey
    """))

  /** q183 — the size-capped variant: entities over [[MaxEntitySize]]
    * revert to singletons with `overflow = true`; `capped_size` is the
    * size of the assignment actually published (1 for reverted
    * members). The audit-facing columns make the refusal visible.
    */
  val q183 = GraftQuery(
    "q183_entity_resolution_capped", {
      (s: SparkSession, d: String) => {
        val over = col("entity_size") > MaxEntitySize
        resolved(t(s, d, "part"))
          .select(col("p_partkey"),
            when(over, col("p_partkey")).otherwise(col("entity_id"))
              .as("entity_id"),
            when(over, lit(1L)).otherwise(col("entity_size"))
              .as("capped_size"),
            over.as("overflow"))
          .orderBy(col("p_partkey"))
      }
    },
    Some(s"""$OracleCtes
      SELECT l.p_partkey,
             CASE WHEN s.entity_size > $MaxEntitySize
                  THEN l.p_partkey ELSE l.entity_id END AS entity_id,
             CAST(CASE WHEN s.entity_size > $MaxEntitySize
                  THEN 1 ELSE s.entity_size END AS BIGINT) AS capped_size,
             s.entity_size > $MaxEntitySize AS overflow
      FROM labeled l JOIN sized s USING (entity_id)
      ORDER BY l.p_partkey
    """))

  val all: Seq[GraftQuery] = Seq(q178, q183)
}
