package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X168 — link prediction by common neighbors / preferential
  * attachment (Liben-Nowell & Kleinberg CIKM'03; Newman Phys. Rev. E
  * 2001 for the common-neighbor signal): for a candidate set of query
  * nodes, rank the NON-adjacent nodes most likely to become neighbors
  * — the "related items you don't co-sell yet" assortment/recommender
  * gap next to X154 (which scores pairs that DO co-occur; this
  * operator's whole output is pairs that never did).
  *
  * Scores are exact integers so the ranking hashes bit-for-bit:
  * cn = |N(u) ∩ N(v)| (the common-neighbor count), tie-broken by
  * pa = d(u)·d(v) (preferential attachment, Barabási), then node id —
  * a total order. Adamic-Adar's Σ 1/ln d(w) is deliberately NOT
  * emitted: ln is not guaranteed correctly rounded across engines, so
  * it cannot join a hash-exact contract (documented, not an oversight).
  *
  * Scale shape — the reason this is candidate-set-bounded: CN for ALL
  * pairs is the Σ d² wedge face (298M rows at sf0.1 on this
  * generator's dense co-purchase graph; degree-ordered orientation
  * does NOT save it, because unlike triangles a wedge's endpoints are
  * non-adjacent, so mixed-orientation wedges are real output). Real
  * linkage serves "predict links FOR these nodes" — queries ⋈ adj ⋈
  * adj is Σ_{w∈N(u)} d(w) ≈ |Q|·d̄² rows, linear in the query set and
  * INDEPENDENT of corpus size once degrees saturate (this generator's
  * co-purchase degrees are scale-constant, ~115 at both sf0.01 and
  * sf0.1). The first hop broadcasts the |Q|-row query frame; the
  * second broadcasts the |Q|·d̄ wedge-center frame; the only big
  * exchange is the adjacency groupBy the graph tier already pays.
  */
object LinkPrediction {

  /** Query nodes: the top-|Q| parts by co-purchase degree. */
  val NQueries = 20

  /** Predicted links kept per query node. */
  val TopK = 10

  /** Symmetric adjacency (c → n both directions) of the distinct
    * co-purchase graph, from (o, p) basket rows.
    */
  def adjacency(baskets: DataFrame): DataFrame = {
    val e = TriangleCount.undirectedEdges(baskets)
    e.select(col("u").as("c"), col("v").as("n"))
      .union(e.select(col("v").as("c"), col("u").as("n")))
  }

  /** Top-`topK` predicted links for the `nQueries` highest-degree
    * nodes of the (o, p) basket graph. Columns: u, v, cn, pa, rk.
    */
  def predict(baskets: DataFrame, nQueries: Int = NQueries,
      topK: Int = TopK): DataFrame = {
    // The edge frame is consumed four ways (degree census, two wedge
    // hops, the existing-edge anti-join): checkpoint so the basket
    // self-join runs once. Checkpoint the |E| UNDIRECTED frame and
    // derive the symmetric adjacency as a lazy two-scan union — half
    // the checkpoint write of materializing 2|E| (measured ~1 s at
    // sf0.1), same total read bytes downstream.
    val e = graft.Checkpoints.eager(TriangleCount.undirectedEdges(baskets))
    val adj = e.select(col("u").as("c"), col("v").as("n"))
      .union(e.select(col("v").as("c"), col("u").as("n")))
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("deg"))
    // top-|Q| hubs via orderBy+limit — a distributed
    // TakeOrderedAndProject heap over the |nodes| degree frame, never
    // a single-partition row_number window (the q239 precedent; the
    // deterministic tiebreak is already in the sort key)
    val qn = deg
      .orderBy(col("deg").desc, col("c"))
      .limit(nQueries)
      .select(col("c").as("u"), col("deg").as("du"))
    // wedge u → w → v, v ≠ u; both hops keep the small side
    // broadcast-shaped (|Q|, then |Q|·d̄ rows).
    val hop1 = adj.join(broadcast(qn), col("c") === col("u"))
      .select(col("u"), col("du"), col("n").as("w"))
    val wedges = adj.join(broadcast(hop1), col("c") === col("w"))
      .select(col("u"), col("du"), col("n").as("v"))
      .filter(col("v") =!= col("u"))
    val cn = wedges.groupBy(col("u"), col("du"), col("v"))
      .agg(count(lit(1)).as("cn"))
    // drop pairs that are ALREADY edges — the operator predicts. The
    // probe is normalized to (least, greatest) so the anti-join runs
    // against the |E| undirected frame, not the 2|E| adjacency.
    val cand = cn.join(e,
        least(cn("u"), cn("v")) === e("u") &&
          greatest(cn("u"), cn("v")) === e("v"), "left_anti")
    val scored = cand
      .join(deg.select(col("c").as("v2"), col("deg").as("dv")),
        col("v") === col("v2"))
      .select(col("u"), col("v"), col("cn"),
        (col("du") * col("dv")).as("pa"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("u"))
        .orderBy(col("cn").desc, col("pa").desc, col("v"))))
      .filter(col("rk") <= topK)
      .orderBy(col("u"), col("rk"))
  }

  /** q207 — top-10 predicted links for the 20 highest-degree parts. */
  val q207 = GraftQuery(
    "q207_link_prediction", {
      (s, d) => {
        GraphScale(s, d)
        predict(t(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct())
      }
    },
    Some(s"""
      WITH b AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e AS (
        SELECT DISTINCT b1.p AS u, b2.p AS v
        FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p),
      adj AS (
        SELECT u AS c, v AS n FROM e
        UNION ALL SELECT v AS c, u AS n FROM e),
      deg AS (SELECT c, COUNT(*) AS deg FROM adj GROUP BY c),
      qn AS (
        SELECT c AS u, deg AS du
        FROM (SELECT c, deg, ROW_NUMBER() OVER (ORDER BY deg DESC, c)
                AS rk FROM deg)
        WHERE rk <= $NQueries),
      wedges AS (
        SELECT qn.u, qn.du, a2.n AS v
        FROM qn
        JOIN adj a1 ON a1.c = qn.u
        JOIN adj a2 ON a2.c = a1.n
        WHERE a2.n <> qn.u),
      cn AS (
        SELECT u, du, v, COUNT(*) AS cn
        FROM wedges GROUP BY u, du, v),
      cand AS (
        SELECT cn.* FROM cn
        WHERE NOT EXISTS (
          SELECT 1 FROM adj WHERE adj.c = cn.u AND adj.n = cn.v)),
      scored AS (
        SELECT cand.u, cand.v, cand.cn, cand.du * deg.deg AS pa
        FROM cand JOIN deg ON deg.c = cand.v)
      SELECT u, v, cn, pa, CAST(rk AS INTEGER) AS rk
      FROM (
        SELECT u, v, cn, pa,
               ROW_NUMBER() OVER (PARTITION BY u
                 ORDER BY cn DESC, pa DESC, v) AS rk
        FROM scored)
      WHERE rk <= $TopK
      ORDER BY u, rk
    """))

  val all: Seq[GraftQuery] = Seq(q207)
}
