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

  /** q178 — every part labeled with its entity id + cluster stats. */
  val q178 = GraftQuery(
    "q178_entity_resolution", {
      (s: SparkSession, d: String) => {
        val parts = t(s, d, "part")
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
          .select(col("p_partkey"), col("entity_id"), col("entity_size"),
            (col("p_partkey") === col("entity_id")).as("is_canonical"))
          .orderBy(col("p_partkey"))
      }
    },
    Some("""
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
        FROM labeled GROUP BY 1)
      SELECT l.p_partkey, l.entity_id, s.entity_size,
             l.p_partkey = l.entity_id AS is_canonical
      FROM labeled l JOIN sized s USING (entity_id)
      ORDER BY l.p_partkey
    """))

  val all: Seq[GraftQuery] = Seq(q178)
}
