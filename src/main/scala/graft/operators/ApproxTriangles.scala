package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X134 — approximate triangle census by deterministic edge
  * sparsification (DOULION, Tsourakakis et al. KDD'09): keep each edge
  * with probability p via a HASH of its endpoints (no RNG — the same
  * edge always makes the same choice in both engines), count triangles
  * exactly on the sparsified graph with X126's machinery, scale by
  * 1/p³. This is the documented approximate tier for the exact
  * family's m^{3/2} ceiling: the sampled wedge face shrinks ~p² and
  * the edge frame ~p, while the estimator's relative error is
  * ~1/√(p³·T) — at 100 TB triangle counts are astronomically large,
  * so the error VANISHES exactly where the exact count becomes
  * unaffordable (the regime where p can also drop far below the 1/5
  * used here).
  *
  * Determinism: the keep decision is an LCG over the endpoint ids
  * (REDUCED before multiplied — the r11 overflow rule; max value
  * ~3.5e16 « 2^63), identical in both engines; the sampled-graph count
  * is exact integer; the estimate is one exact long multiply.
  *
  * Deliberately NOT under [[GraphScale]] (r17, VERDICT r16 item 7):
  * the p = 1/5 sampling happens BEFORE the oriented faces, so the
  * wedge working set is ~p² = 1/25 of the exact tier's at the same
  * input — the rule's premise (per-partition sort volume of the FULL
  * edge frame) does not apply, and the measured 0.61 decade exponent
  * predates any partition pressure.
  */
object ApproxTriangles {

  /** Keep probability denominator: LCG micro-units < Mass/Denom
    * (p = 1/5). NOT an `lcg % 5` form — 1103515245 is divisible by 5,
    * so a direct small-modulus residue of the LCG is constant; the
    * threshold-over-micro-units form (the repo's standard recipe)
    * stays uniform because multiples of gcd(a, 10^6)=5 are uniform
    * over [0, 10^6).
    */
  val Denom = 5

  /** 1/p³ — the DOULION triangle-count scale factor. */
  val Scale: Long = Denom.toLong * Denom * Denom

  /** The deterministic keep predicate on (u, v) columns: fold the pair
    * into one key (reduced before multiplied — the r11 overflow rule),
    * one LCG step to micro-units, threshold at p.
    */
  def kept(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val key = ((u % 1000003L) * 1009L + (v % 1000003L)) % 1000003L
    (key * 1103515245L + 12345L) % 1000000L < (1000000L / Denom)
  }

  /** q176 — sparsified triangle census + the DOULION estimate. */
  val q176 = GraftQuery(
    "q176_approx_triangles", {
      (s, d) => {
        val baskets = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        // r19 optimization: `e` is consumed twice — the sampled→orient
        // path (inside its own checkpoint job) and the final
        // n_edges census — and the checkpoint boundary defeats
        // exchange reuse between the two, so the Σ|basket|² self-join
        // + distinct executed TWICE. Materialize it once; both
        // consumers read the (2-long-per-row) edge frame.
        val e = graft.Checkpoints.eager(
          TriangleCount.undirectedEdges(baskets))
        val sampled = e.filter(kept(col("u"), col("v")))
        val o = graft.Checkpoints.eager(TriangleCount.orient(sampled))
        val triS = TriangleCount.triangles(o)
          .agg(count(lit(1)).as("tri_sampled"))
          .select(col("tri_sampled"),
            (col("tri_sampled") * lit(Scale)).as("tri_est"))
        e.agg(count(lit(1)).as("n_edges"))
          .join(broadcast(o.agg(count(lit(1)).as("n_edges_sampled"))))
          .join(broadcast(triS))
          .select(col("n_edges"), col("n_edges_sampled"),
            col("tri_sampled"), col("tri_est"))
      }
    },
    Some(s"""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      e AS (SELECT DISTINCT b1.p AS u, b2.p AS v
            FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p),
      es AS (SELECT u, v FROM e
             WHERE ((((u % 1000003) * 1009 + (v % 1000003)) % 1000003)
                    * 1103515245 + 12345) % 1000000
                   < ${1000000L / Denom}),
      und AS (SELECT u AS node FROM es UNION ALL SELECT v FROM es),
      deg AS (SELECT node, COUNT(*) AS d FROM und GROUP BY 1),
      o AS (SELECT CASE WHEN (d1.d, es.u) < (d2.d, es.v)
                        THEN es.u ELSE es.v END AS s,
                   CASE WHEN (d1.d, es.u) < (d2.d, es.v)
                        THEN es.v ELSE es.u END AS t,
                   CASE WHEN (d1.d, es.u) < (d2.d, es.v)
                        THEN d2.d ELSE d1.d END AS dt
            FROM es JOIN deg d1 ON d1.node = es.u
                    JOIN deg d2 ON d2.node = es.v),
      tri AS (SELECT COUNT(*) AS tri_sampled
              FROM o o1 JOIN o o2
                ON o1.s = o2.s AND (o1.dt, o1.t) < (o2.dt, o2.t)
              JOIN o o3 ON o3.s = o1.t AND o3.t = o2.t)
      SELECT (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT COUNT(*) FROM es) AS n_edges_sampled,
             CAST(tri_sampled AS BIGINT) AS tri_sampled,
             CAST(tri_sampled * $Scale AS BIGINT) AS tri_est
      FROM tri
    """))

  val all: Seq[GraftQuery] = Seq(q176)
}
