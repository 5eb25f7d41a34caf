package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Q._

/** X126 — triangle counting + clustering coefficients over the
  * co-purchase graph: the graph-density audit next to X24's connected
  * components (CC says WHICH nodes touch; triangles say how CLIQUISH
  * the neighborhoods are — community structure vs star/chain noise,
  * and the standard spam/bot signal in interaction graphs).
  *
  * Algorithm: degree-ordered orientation (the "compact-forward" /
  * Schank-Wagner discipline, also MapReduce-famous as Suri & Vassilvitskii
  * WWW'11): every undirected edge is oriented from its (degree, id)-
  * smaller endpoint to the larger, so each triangle is counted exactly
  * once at its smallest corner and — the scale property — every
  * oriented out-neighborhood is O(√m), bounding the wedge join output
  * by O(m^{3/2}) instead of Σ d² (a hub's d² wedge blowup never
  * materializes; the hub sits on the RECEIVING side of its edges).
  * Wedges join back to the oriented edge set on (v, w) — three
  * hash joins shuffling on node/edge keys, no cartesian anywhere.
  *
  * Determinism: everything up to the coefficients is exact integer;
  * global cc = 3T/W and local cc = 2t_v/(d_v(d_v−1)) are each one
  * shared double tree (IEEE ×,÷ correctly rounded ⇒ identical bits);
  * top-20 ties broken by node id.
  */
object TriangleCount {

  val TopNodes = 20

  /** Oriented edges (s → t) of the distinct co-purchase graph built
    * from (basket, item) rows named (o, p): each undirected edge points
    * from its (degree, id)-SMALLER endpoint to the larger. The total
    * order must be (degree, id) everywhere downstream too — an earlier
    * formulation ordered wedge pairs by bare node id and silently
    * missed every triangle whose corners' id order disagreed with their
    * degree order (e.g. triangle {1,2,3} + pendant 2–4: edge 2–3
    * orients 3→2 because deg(3)=2 < deg(2)=3, and an id-ordered wedge
    * at 1 probes for 2→3 and finds nothing). The intersection form of
    * [[triangles]] needs no pair ordering at all — only the DAG
    * property — so the output is the bare (s, t) edge list.
    */
  def orientedEdges(baskets: DataFrame): DataFrame =
    orient(undirectedEdges(baskets))

  /** Distinct undirected (u < v) co-purchase edges from (o, p) rows. */
  def undirectedEdges(baskets: DataFrame): DataFrame =
    baskets.as("b1")
      .join(baskets.as("b2"),
        col("b1.o") === col("b2.o") && col("b1.p") < col("b2.p"))
      .select(col("b1.p").as("u"), col("b2.p").as("v"))
      .distinct()

  /** Degree-orient an undirected (u, v) edge list — degrees computed
    * on the GIVEN graph (X134's sparsified graph orients by its own
    * degrees, which preserves the O(√m') neighborhood bound there).
    */
  def orient(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.withColumnRenamed("node", "u")
        .withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("node", "v")
        .withColumnRenamed("d", "dv"), "v")
    val lo = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    withDeg.select(
      when(lo, col("u")).otherwise(col("v")).as("s"),
      when(lo, col("v")).otherwise(col("u")).as("t"))
  }

  /** One row per triangle (its three corners), counted once each.
    *
    * Edge-iterator form (compact-forward's merge step): for each
    * oriented edge a→b, the closing corners are the COMMON
    * OUT-NEIGHBORS of a and b — every triangle has the DAG shape
    * a→b, a→c, b→c under the orientation, so it is found exactly once
    * at its (a, b) edge. Out-neighborhoods are collected into per-node
    * arrays (each O(√m) by the orientation) and intersected per edge
    * row in codegen — the O(m^{3/2}) wedge face is CPU work inside a
    * row, never a 40M-row shuffle: the only exchanges are the
    * |nodes|-sized adjacency groupBy and two |edges|-sized joins (an
    * earlier wedge-join formulation shuffled 41M wedge rows at sf0.1
    * and cost 2.5× as much end-to-end).
    */
  def triangles(o: DataFrame): DataFrame = {
    val nbr = o.groupBy(col("s")).agg(collect_list(col("t")).as("ns"))
    o.join(nbr.select(col("s").as("a"), col("ns").as("na")),
        col("s") === col("a"))
      .join(nbr.select(col("s").as("b"), col("ns").as("nb")),
        col("t") === col("b"))
      .select(col("s").as("x"), col("t").as("y"),
        explode(array_intersect(col("na"), col("nb"))).as("z"))
  }

  private def dd1(d: Column): Column =
    d.cast("double") * (d - lit(1)).cast("double")

  /** q168 — global triangle census + top nodes by triangle count. */
  val q168 = GraftQuery(
    "q168_triangle_count", {
      (s, d) => {
        GraphScale(s, d)
        val baskets = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        // The oriented edge frame is consumed four ways (o1/o2/o3 in the
        // wedge join + the degree census): eager-checkpoint it so the
        // basket self-join → distinct → degree-join derivation runs ONCE
        // instead of once per consumer.
        val o = graft.Checkpoints.eager(orientedEdges(baskets))
        // ONE pass over the triangle frame: corners via explode (a
        // 3-way union would re-execute the intersection join per
        // branch), checkpointed because both the top-20 and the
        // global census read it; n_triangles = Σ tri_cnt / 3 (each
        // triangle contributes exactly 3 corner increments) so the
        // triangle join never runs a second time.
        val corners = graft.Checkpoints.eager(
          triangles(o)
            .select(explode(array(col("x"), col("y"), col("z")))
              .as("node"))
            .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt")))
        val deg = o.select(col("s").as("node"))
          .union(o.select(col("t").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
        val globals = deg.agg(
          count(lit(1)).as("n_nodes"),
          // d(d−1)/2 is an exact integer per node and Σd is even —
          // divide as integers so the sums stay order-insensitive
          expr("sum(d) div 2").as("n_edges"),
          expr("sum(d * (d - 1) div 2)").as("n_wedges"))
          .join(broadcast(corners
            .agg(coalesce(expr("sum(tri_cnt) div 3"), lit(0L))
              .as("n_triangles"))))
          .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
            col("n_triangles"),
            ((lit(3).cast("double") * col("n_triangles").cast("double"))
              / col("n_wedges").cast("double")).as("global_cc"))
        corners.join(deg, "node")
          .select(col("node"), col("d"), col("tri_cnt"),
            when(col("d") < 2, lit(0.0d))
              .otherwise((lit(2).cast("double") *
                col("tri_cnt").cast("double")) / dd1(col("d")))
              .as("local_cc"))
          .orderBy(col("tri_cnt").desc, col("node"))
          .limit(TopNodes)
          .join(broadcast(globals))
          .orderBy(col("tri_cnt").desc, col("node"))
      }
    },
    Some(s"""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      e AS (SELECT DISTINCT b1.p AS u, b2.p AS v
            FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p),
      und AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
      deg AS (SELECT node, COUNT(*) AS d FROM und GROUP BY 1),
      o AS (SELECT CASE WHEN (d1.d, e.u) < (d2.d, e.v)
                        THEN e.u ELSE e.v END AS s,
                   CASE WHEN (d1.d, e.u) < (d2.d, e.v)
                        THEN e.v ELSE e.u END AS t,
                   CASE WHEN (d1.d, e.u) < (d2.d, e.v)
                        THEN d2.d ELSE d1.d END AS dt
            FROM e JOIN deg d1 ON d1.node = e.u
                   JOIN deg d2 ON d2.node = e.v),
      tri AS (SELECT o1.s AS x, o1.t AS y, o2.t AS z
              FROM o o1 JOIN o o2
                ON o1.s = o2.s AND (o1.dt, o1.t) < (o2.dt, o2.t)
              JOIN o o3 ON o3.s = o1.t AND o3.t = o2.t),
      corners AS (
        SELECT node, COUNT(*) AS tri_cnt FROM (
          SELECT x AS node FROM tri UNION ALL
          SELECT y FROM tri UNION ALL
          SELECT z FROM tri) GROUP BY 1),
      globals AS (
        SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
               CAST((SELECT SUM(d) FROM deg) // 2 AS BIGINT) AS n_edges,
               CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT)
                 AS n_wedges,
               (SELECT COUNT(*) FROM tri) AS n_triangles),
      top AS (
        SELECT c.node, d.d, c.tri_cnt,
               CASE WHEN d.d < 2 THEN 0.0
                    ELSE (CAST(2 AS DOUBLE) * CAST(c.tri_cnt AS DOUBLE))
                         / (CAST(d.d AS DOUBLE)
                            * CAST(d.d - 1 AS DOUBLE)) END AS local_cc
        FROM corners c JOIN deg d ON d.node = c.node
        ORDER BY c.tri_cnt DESC, c.node
        LIMIT $TopNodes)
      SELECT top.node, top.d, top.tri_cnt, top.local_cc,
             g.n_nodes, g.n_edges, g.n_wedges, g.n_triangles,
             (CAST(3 AS DOUBLE) * CAST(g.n_triangles AS DOUBLE))
               / CAST(g.n_wedges AS DOUBLE) AS global_cc
      FROM top CROSS JOIN globals g
      ORDER BY top.tri_cnt DESC, top.node
    """))

  val all: Seq[GraftQuery] = Seq(q168)
}
