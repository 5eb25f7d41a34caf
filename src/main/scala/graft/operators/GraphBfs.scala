package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** X144 — multi-source BFS hop distances over the co-purchase graph
  * (the Pregel/GraphX `shortestPaths` primitive as Catalyst joins):
  * given a seed set, label every node with its minimum hop distance —
  * the reachability/influence-radius measurement next to X24's
  * components (CC says which nodes touch AT ALL; BFS says how far),
  * and the standard "expand from trusted seeds" step in corpus
  * curation (seed-site distance as a quality prior, Gao et al.
  * harmonic centrality over CommonCrawl being the scaled-up form).
  *
  * FIXED horizon (3 hops, the X65/X133 fixed-iteration replay
  * discipline): per round ONE join of the frontier against the
  * edge list — the edge frame is `repartition(src)`-ed BEFORE its
  * checkpoint (the q175 idiom) so every round reuses the same
  * exchange and only the (small) frontier side moves — then a
  * distinct + anti-join against the settled set. Frontiers shrink
  * monotonically; the horizon bounds worst-case work at exactly
  * 3 edge scans regardless of graph diameter.
  *
  * Determinism: hop labels are exact integers; per-level census
  * (count, min/max/sum of node ids) is exact; unreached nodes are
  * REPORTED (dist = −1), not dropped. The oracle unrolls the same 3
  * rounds as chained CTEs with EXCEPT — no recursive CTE, so the
  * path-explosion hazard of UNION-ALL recursion never arises.
  */
object GraphBfs {

  val Hops = 3

  /** Per-round frontier expansion: settled (node, dist) + frontier →
    * (settled ∪ next, next). Exposed for the spec's driver replay.
    */
  def expand(edges: DataFrame, settled: DataFrame, frontier: DataFrame,
      hop: Int): (DataFrame, DataFrame) = {
    val next = graft.Checkpoints.eager(
      edges.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .select(col("node"), lit(hop).as("dist")))
    (graft.Checkpoints.eager(settled.unionByName(next)),
      next.select(col("node")))
  }

  /** q185 — hop-distance census from the `% 97 = 0` seed set. */
  val q185 = GraftQuery(
    "q185_bfs_hops", {
      (s: SparkSession, d: String) => {
        GraphScale(s, d)
        val baskets = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val und = TriangleCount.undirectedEdges(baskets)
        val edges = graft.Checkpoints.eager(
          und.select(col("u").as("src"), col("v").as("dst"))
            .union(und.select(col("v").as("src"), col("u").as("dst")))
            .repartition(col("src")))
        val nodes = edges.select(col("src").as("node")).distinct()
        var settled: DataFrame = graft.Checkpoints.eager(
          nodes.filter(col("node") % 97 === 0)
            .select(col("node"), lit(0).as("dist")))
        var frontier: DataFrame = settled.select(col("node"))
        (1 to Hops).foreach { h =>
          val (st, fr) = expand(edges, settled, frontier, h)
          settled = st; frontier = fr
        }
        val unreached = nodes.join(settled, Seq("node"), "left_anti")
          .select(col("node"), lit(-1).as("dist"))
        settled.unionByName(unreached)
          .groupBy(col("dist"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("node")).as("min_node"),
            max(col("node")).as("max_node"),
            sum(col("node")).as("sum_node"))
          .orderBy(col("dist"))
      }
    },
    Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      und AS (SELECT DISTINCT b1.p AS u, b2.p AS v
              FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p),
      e AS (SELECT u AS src, v AS dst FROM und
            UNION ALL SELECT v, u FROM und),
      n AS (SELECT DISTINCT src AS node FROM e),
      d0 AS (SELECT node FROM n WHERE node % 97 = 0),
      r1 AS (SELECT DISTINCT e.dst AS node FROM e
               JOIN d0 ON d0.node = e.src
             EXCEPT SELECT node FROM d0),
      r2 AS (SELECT DISTINCT e.dst AS node FROM e
               JOIN r1 ON r1.node = e.src
             EXCEPT SELECT node FROM d0
             EXCEPT SELECT node FROM r1),
      r3 AS (SELECT DISTINCT e.dst AS node FROM e
               JOIN r2 ON r2.node = e.src
             EXCEPT SELECT node FROM d0
             EXCEPT SELECT node FROM r1
             EXCEPT SELECT node FROM r2),
      unreached AS (SELECT node FROM n
                    EXCEPT SELECT node FROM d0
                    EXCEPT SELECT node FROM r1
                    EXCEPT SELECT node FROM r2
                    EXCEPT SELECT node FROM r3),
      dist AS (
        SELECT node, 0 AS dist FROM d0
        UNION ALL SELECT node, 1 FROM r1
        UNION ALL SELECT node, 2 FROM r2
        UNION ALL SELECT node, 3 FROM r3
        UNION ALL SELECT node, -1 FROM unreached)
      SELECT dist, COUNT(*) AS n_nodes,
             MIN(node) AS min_node, MAX(node) AS max_node,
             CAST(SUM(node) AS BIGINT) AS sum_node
      FROM dist GROUP BY 1 ORDER BY 1
    """))

  val all: Seq[GraftQuery] = Seq(q185)
}
