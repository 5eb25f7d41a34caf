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
    * from (basket, item) rows named (o, p). Carries `dt` — the degree
    * of the TARGET endpoint — because the wedge join must order the two
    * out-neighbors by the SAME (degree, id) total order the orientation
    * used: ordering them by bare node id would look for the closing
    * edge in the wrong direction whenever id order disagrees with
    * degree order, silently dropping those triangles (e.g. triangle
    * {1,2,3} + pendant edge 2–4: edge 2–3 orients 3→2 because
    * deg(3)=2 < deg(2)=3, and the wedge at 1 with id-ordered pair
    * (2,3) would probe for 2→3 and miss it).
    */
  def orientedEdges(baskets: DataFrame): DataFrame = {
    val e = baskets.as("b1")
      .join(baskets.as("b2"),
        col("b1.o") === col("b2.o") && col("b1.p") < col("b2.p"))
      .select(col("b1.p").as("u"), col("b2.p").as("v"))
      .distinct()
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
      when(lo, col("v")).otherwise(col("u")).as("t"),
      when(lo, col("dv")).otherwise(col("du")).as("dt"))
  }

  /** One row per triangle (its three corners), counted once each. The
    * wedge pair is ordered by (dt, t) — the orientation's own total
    * order — so the closing edge is always stored as o1.t → o2.t.
    */
  def triangles(o: DataFrame): DataFrame =
    o.as("o1")
      .join(o.as("o2"),
        col("o1.s") === col("o2.s") &&
          struct(col("o1.dt"), col("o1.t")) <
            struct(col("o2.dt"), col("o2.t")))
      .join(o.as("o3"),
        col("o3.s") === col("o1.t") && col("o3.t") === col("o2.t"))
      .select(col("o1.s").as("x"), col("o1.t").as("y"),
        col("o2.t").as("z"))

  private def dd1(d: Column): Column =
    d.cast("double") * (d - lit(1)).cast("double")

  /** q168 — global triangle census + top nodes by triangle count. */
  val q168 = GraftQuery(
    "q168_triangle_count", {
      (s, d) => {
        val baskets = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        // The oriented edge frame is consumed four ways (o1/o2/o3 in the
        // wedge join + the degree census): eager-checkpoint it so the
        // basket self-join → distinct → degree-join derivation runs ONCE
        // instead of once per consumer.
        val o = graft.Checkpoints.eager(orientedEdges(baskets))
        val tri = triangles(o)
        val corners = tri.select(col("x").as("node"))
          .union(tri.select(col("y").as("node")))
          .union(tri.select(col("z").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
        val deg = o.select(col("s").as("node"))
          .union(o.select(col("t").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
        val globals = deg.agg(
          count(lit(1)).as("n_nodes"),
          // d(d−1)/2 is an exact integer per node and Σd is even —
          // divide as integers so the sums stay order-insensitive
          expr("sum(d) div 2").as("n_edges"),
          expr("sum(d * (d - 1) div 2)").as("n_wedges"))
          .join(broadcast(tri.agg(count(lit(1)).as("n_triangles"))))
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
