package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X133 — PageRank centrality over the co-purchase graph (Brin & Page,
  * WWW'98) in EXACT INTEGER micro-mass: the link-quality signal of
  * every web-corpus curation stack (page importance as a keep/weight
  * prior — the CommonCrawl-style complement to X59's per-document
  * quality classifier), and the third leg of the graph tier next to
  * X24's components and X126's triangles.
  *
  * Power iteration with a FIXED count (3, the X65 Lloyd-replay
  * discipline) and all arithmetic in integer micro-units of a 10^12
  * total mass: r_0 = M div N; r_{k+1}(v) = (15% · M) div N +
  * (85 · Σ_{u→v} r_k(u) div d(u)) div 100. Every step is integer
  * div/sum — order-insensitive, overflow-free (inflow ≤ 10^12, ×85
  * « 2^63), and identical under Spark `div` vs DuckDB `//` (both
  * non-negative). Truncation loses ≤ d(u) micro-units per node per
  * round — deterministic in both engines, which is the contract; a
  * float PageRank would be order-dependent across partitionings.
  *
  * Shape: per iteration ONE join of the edge list against the
  * |nodes|-sized rank frame (shuffle on src) and one groupBy(dst) —
  * the textbook Pregel/GraphX cost, expressed as Catalyst joins so
  * AQE handles hub skew; the edge frame (with out-degree attached) is
  * built once and eager-checkpointed across the 3 rounds.
  */
object PageRank {

  /** Total mass in micro-units. */
  val Mass = 1000000000000L

  /** Fixed iteration count (deterministic replay, like X65's Lloyd). */
  val Iters = 3

  val TopNodes = 20

  /** One damped, integer-exact iteration: rank frame (node, d, r) →
    * next rank frame over edges (u, v).
    */
  def step(edges: DataFrame, ranks: DataFrame, nNodes: Long): DataFrame = {
    val inflow = edges
      .join(ranks.select(col("node").as("u"), col("d").as("du"),
        col("r").as("ru")), col("src") === col("u"))
      .groupBy(col("dst"))
      .agg(sum(expr("ru div du")).as("inflow"))
    ranks.select(col("node"), col("d"))
      .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .select(col("node"), col("d"),
        (lit(Mass * 15L / 100L / nNodes) +
          expr("coalesce(inflow, 0L) * 85 div 100")).as("r"))
  }

  /** q175 — 3-round integer PageRank, top nodes by rank. */
  val q175 = GraftQuery(
    "q175_pagerank", {
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
        // repartition on src BEFORE the checkpoint: localCheckpoint
        // preserves partitioning, so all three iteration joins reuse
        // the exchange instead of re-shuffling the (2m)-row edge
        // frame every round — at 240M edges that exchange was the
        // dominant per-iteration cost
        val edges = graft.Checkpoints.eager(
          und.select(col("u").as("src"), col("v").as("dst"))
            .union(und.select(col("v").as("src"), col("u").as("dst")))
            .repartition(col("src")))
        val deg = edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("d"))
        val nNodes = deg.count()
        var ranks = deg.select(col("node"), col("d"),
          lit(Mass / nNodes).as("r"))
        (1 to Iters).foreach { _ =>
          ranks = graft.Checkpoints.eager(step(edges, ranks, nNodes))
        }
        ranks
          .select(col("node"), col("d"), col("r").as("rank_micro"))
          .orderBy(col("rank_micro").desc, col("node"))
          .limit(TopNodes)
          .withColumn("n_nodes", lit(nNodes))
          .orderBy(col("rank_micro").desc, col("node"))
      }
    },
    Some(s"""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      und AS (SELECT DISTINCT b1.p AS u, b2.p AS v
              FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p),
      e AS (SELECT u AS src, v AS dst FROM und
            UNION ALL SELECT v, u FROM und),
      deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
      nn AS (SELECT COUNT(*) AS n_nodes FROM deg),
      r0 AS (SELECT node, d, $Mass // n_nodes AS r
             FROM deg CROSS JOIN nn),
      i1 AS (SELECT e.dst AS node, SUM(r0.r // r0.d) AS inflow
             FROM e JOIN r0 ON r0.node = e.src GROUP BY 1),
      r1 AS (SELECT r0.node, r0.d,
                    (($Mass * 15 // 100) // n_nodes)
                      + (COALESCE(i1.inflow, 0) * 85 // 100) AS r
             FROM r0 CROSS JOIN nn LEFT JOIN i1 ON i1.node = r0.node),
      i2 AS (SELECT e.dst AS node, SUM(r1.r // r1.d) AS inflow
             FROM e JOIN r1 ON r1.node = e.src GROUP BY 1),
      r2 AS (SELECT r1.node, r1.d,
                    (($Mass * 15 // 100) // n_nodes)
                      + (COALESCE(i2.inflow, 0) * 85 // 100) AS r
             FROM r1 CROSS JOIN nn LEFT JOIN i2 ON i2.node = r1.node),
      i3 AS (SELECT e.dst AS node, SUM(r2.r // r2.d) AS inflow
             FROM e JOIN r2 ON r2.node = e.src GROUP BY 1),
      r3 AS (SELECT r2.node, r2.d,
                    (($Mass * 15 // 100) // n_nodes)
                      + (COALESCE(i3.inflow, 0) * 85 // 100) AS r
             FROM r2 CROSS JOIN nn LEFT JOIN i3 ON i3.node = r2.node)
      SELECT node, d, CAST(r AS BIGINT) AS rank_micro,
             (SELECT n_nodes FROM nn) AS n_nodes
      FROM r3
      ORDER BY rank_micro DESC, node
      LIMIT $TopNodes
    """))

  val all: Seq[GraftQuery] = Seq(q175)
}
