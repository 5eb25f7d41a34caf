package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X151 — label-propagation community detection (Raghavan, Albert &
  * Kumara, "Near linear time algorithm to detect community structures
  * in large-scale networks", Phys. Rev. E 76, 2007): the cheap
  * community primitive between X24's components (connectivity — one
  * bridge edge merges two dense groups) and X150's k-core (density
  * threshold, no assignment): every node adopts the label most common
  * among its neighbors, so dense regions agree on one label within a
  * few rounds while bridges stay outvoted. For a curation stack this
  * is the topic/segment grouping over the co-purchase graph that X24
  * over-merges.
  *
  * Formulation: SYNCHRONOUS updates with a FIXED 3 rounds and a total
  * tie-break (vote count desc, then SMALLEST label) — the paper's
  * asynchronous random-order sweep is not replayable across engines,
  * so the deterministic synchronous form is the contract (stated, not
  * hidden: synchronous LPA can oscillate on bipartite-ish structure —
  * a fixed round count makes even an oscillation bit-deterministic,
  * and the spec pins a planted oscillator's round-3 state). Labels
  * start as node ids.
  *
  * Shape: per round ONE edges⋈labels join keyed on src — the edge
  * frame is repartition(src)-checkpointed once (the q175 idiom), so
  * every round reuses that exchange — then one map-side-combined
  * groupBy to the (dst, label) vote frame and one per-dst window over
  * it; the vote frame is bounded by Σ_v |distinct neighbor labels of
  * v| ≤ 2m rows of three longs, never by text or the corpus. The
  * output collapses to the |communities| frame.
  */
object LabelPropagation {

  /** Fixed synchronous rounds (the X65/X133/X144 replay discipline). */
  val Rounds = 3

  val TopCommunities = 100

  /** One synchronous vote round: labels (node, lbl) → new labels.
    *
    * The per-dst winner is picked by a hash aggregate
    * `min(struct(-c, lbl))` instead of the former
    * `row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl)` +
    * `rn = 1` filter: lexicographic struct-min IS the (votes desc,
    * smallest label) total tie-break (labels are non-negative node
    * ids, counts ≥ 1, so the negation never overflows), and the
    * aggregate replaces a per-round shuffle+SORT+WindowExec over the
    * vote frame with a partial-aggregating, codegen HashAggregate —
    * the same exchange count, no sort (r19 optimization, guide §2.3
    * "aggregate before you shuffle" / §4 expression choice). Verified
    * bit-identical to the window form by the q192 oracle hash and
    * LabelPropagationSpec's planted-oscillator replay.
    */
  def step(edges: DataFrame, labels: DataFrame): DataFrame =
    edges
      .join(labels.withColumnRenamed("node", "src"), Seq("src"))
      .groupBy(col("dst"), col("lbl"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("dst"))
      .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("w"))
      .select(col("dst").as("node"), col("w.l").as("lbl"))

  /** q192 — 3-round LPA over the co-purchase graph: the largest
    * communities plus the global community count.
    */
  val q192 = GraftQuery(
    "q192_label_propagation", {
      (s, d) => {
        GraphScale(s, d)
        val baskets = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val und = baskets.as("b1")
          .join(baskets.as("b2"),
            col("b1.o") === col("b2.o") && col("b1.p") < col("b2.p"))
          .select(col("b1.p").as("u"), col("b2.p").as("v"))
          .distinct()
        val edges = graft.Checkpoints.eager(
          und.select(col("u").as("src"), col("v").as("dst"))
            .union(und.select(col("v").as("src"), col("u").as("dst")))
            .repartition(col("src")))
        var labels = edges.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
        (1 to Rounds).foreach { _ =>
          labels = graft.Checkpoints.eager(step(edges, labels))
        }
        val comms = labels.groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).as("size"))
        val n = comms.agg(count(lit(1)).as("n_communities"))
        comms
          .orderBy(col("size").desc, col("community"))
          .limit(TopCommunities)
          .join(broadcast(n))
          .orderBy(col("size").desc, col("community"))
      }
    },
    Some {
      val prelude = """
      WITH b AS MATERIALIZED (
             SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             FROM lineitem),
      und AS MATERIALIZED (
              SELECT DISTINCT b1.p AS u, b2.p AS v
              FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p),
      e AS MATERIALIZED (
             SELECT u AS src, v AS dst FROM und
             UNION ALL SELECT v, u FROM und),
      l0 AS MATERIALIZED (
             SELECT DISTINCT src AS node, src AS lbl FROM e)"""
      val rounds = (1 to Rounds).map { r =>
        s"""
      v$r AS MATERIALIZED (
             SELECT e.dst, l.lbl, COUNT(*) AS c
             FROM e JOIN l${r - 1} l ON l.node = e.src
             GROUP BY 1, 2),
      l$r AS MATERIALIZED (
             SELECT dst AS node, lbl FROM (
               SELECT dst, lbl,
                      ROW_NUMBER() OVER (PARTITION BY dst
                        ORDER BY c DESC, lbl) AS rn
               FROM v$r)
             WHERE rn = 1)"""
      }.mkString(",")
      s"""$prelude,$rounds,
      comms AS (SELECT lbl AS community, COUNT(*) AS size
                FROM l$Rounds GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_communities FROM comms)
      SELECT community, size, n_communities
      FROM (SELECT * FROM comms
            ORDER BY size DESC, community LIMIT $TopCommunities)
      CROSS JOIN n
      ORDER BY size DESC, community
    """
    })

  val all: Seq[GraftQuery] = Seq(q192)
}
