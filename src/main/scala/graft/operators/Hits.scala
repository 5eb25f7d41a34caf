package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X159 — HITS hubs & authorities (Kleinberg, "Authoritative sources
  * in a hyperlinked environment", JACM 46(5) 1999) over the BIPARTITE
  * order→part graph: authority(part) = Σ hub(order) over its orders,
  * hub(order) = Σ authority(part) over its parts — the mutual
  * reinforcement X133's PageRank (a random walk on the co-purchase
  * projection) does not express: a part is authoritative because BIG
  * baskets carry it, a basket is a hub because it carries
  * authoritative parts. Graph-tier leg 7, and the first operator on
  * the bipartite form directly (X125/X126/X133 all project it away).
  *
  * Exact integer arithmetic (the X133 discipline): scores live in
  * integer units of a 10⁸ total mass; each half-round is one edge
  * join + groupBy(sum), then L1 NORMALIZATION back to mass M as
  * raw·M div Σraw — integer floor div, order-insensitive, identical
  * in both engines. FIXED 2 full rounds. Overflow is BOUNDED BY
  * CONSTRUCTION, not hoped: after every normalization Σscore ≤ M, so
  * any raw inflow ≤ maxDegree·M and the normalization multiply ≤
  * maxDegree·M² — the code `require`s maxDegree·M² ≤ 2⁶³ (≈ degree
  * 900 at M = 10⁸; this generator's baskets reach 11 distinct parts,
  * TPC-H's 7 — a wider corpus lowers M), so everything stays in a
  * long (DuckDB would error loudly on overflow via HUGEINT→BIGINT
  * casts, Spark would wrap silently — the require keeps the engines
  * honest together).
  *
  * Shape: per half-round ONE join of the edge list against the
  * score frame (shuffle on the edge key) + a map-side-combined
  * groupBy — the X133 cost on the bipartite edge set; normalization
  * totals are 1-row frames (maxRows=1 broadcast, unhinted).
  */
object Hits {

  /** Total L1 mass (10⁸ — sized so maxDeg·M² < 2⁶³ for any order
    * degree up to 900; this generator's baskets reach 11 distinct
    * parts, TPC-H's 7).
    */
  val Mass = 100000000L

  /** Fixed full rounds (authority half + hub half). */
  val Rounds = 2

  val TopParts = 20

  /** q199 — 2-round integer HITS: top parts by authority. */
  val q199 = GraftQuery(
    "q199_hits", {
      (s, d) => {
        GraphScale(s, d)
        val edges = graft.Checkpoints.eager(
          t(s, d, "lineitem")
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
            .distinct()
            .repartition(col("o")))
        // one planning job for both stats (1-row collect, the house
        // bounded-collect discipline)
        val stats = edges.groupBy(col("o")).agg(count(lit(1)).as("d"))
          .agg(max(col("d")).as("maxd"), count(lit(1)).as("n"))
          .collect()(0)
        val (maxDeg, nOrders) = (stats.getLong(0), stats.getLong(1))
        require(maxDeg * Mass <= Long.MaxValue / Mass,
          s"order degree $maxDeg would overflow the integer mass — " +
            "lower Mass for wider baskets")
        def normalize(raw: DataFrame, key: String): DataFrame = {
          val tot = raw.agg(sum(col("raw")).as("s"))
          raw.join(tot).select(col(key),
            expr(s"raw * $Mass div s").as("score"))
        }
        var hubs = edges.select(col("o")).distinct()
          .select(col("o"), lit(Mass / nOrders).as("score"))
        var auth: DataFrame = null
        (1 to Rounds).foreach { r =>
          auth = graft.Checkpoints.eager(normalize(
            edges.join(hubs, Seq("o"))
              .groupBy(col("p")).agg(sum(col("score")).as("raw")), "p"))
          // the output reads only `auth`: the final round's hub half
          // (one edge join + groupBy + normalize + checkpoint) feeds
          // nothing downstream, so it is skipped — auth after round
          // `Rounds` is bit-identical either way (r19 optimization,
          // guide §1.2 "don't compute things you throw away")
          if (r < Rounds)
            hubs = graft.Checkpoints.eager(normalize(
              edges.join(auth.withColumnRenamed("score", "a"), Seq("p"))
                .groupBy(col("o")).agg(sum(col("a")).as("raw")), "o"))
        }
        auth
          .join(edges.groupBy(col("p")).agg(count(lit(1)).as("n_orders")),
            Seq("p"))
          .select(col("p").as("part"), col("score").as("authority_micro"),
            col("n_orders"))
          .orderBy(col("authority_micro").desc, col("part"))
          .limit(TopParts)
          .orderBy(col("authority_micro").desc, col("part"))
      }
    },
    Some {
      val prelude = s"""
      WITH e AS MATERIALIZED (
             SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             FROM lineitem),
      nn AS (SELECT COUNT(DISTINCT o) AS n_orders FROM e),
      h0 AS MATERIALIZED (
             SELECT o, $Mass // n_orders AS score
             FROM (SELECT DISTINCT o FROM e) CROSS JOIN nn)"""
      val rounds = (1 to Rounds).map { r =>
        s"""
      ar$r AS MATERIALIZED (
             SELECT e.p, SUM(h.score) AS raw
             FROM e JOIN h${r - 1} h ON h.o = e.o GROUP BY 1),
      a$r AS MATERIALIZED (
             SELECT p, raw * $Mass // (SELECT SUM(raw) FROM ar$r)
               AS score
             FROM ar$r),
      hr$r AS MATERIALIZED (
             SELECT e.o, SUM(a.score) AS raw
             FROM e JOIN a$r a ON a.p = e.p GROUP BY 1),
      h$r AS MATERIALIZED (
             SELECT o, raw * $Mass // (SELECT SUM(raw) FROM hr$r)
               AS score
             FROM hr$r)"""
      }.mkString(",")
      s"""$prelude,$rounds,
      deg AS (SELECT p, COUNT(*) AS n_orders FROM e GROUP BY 1)
      SELECT a.p AS part, CAST(a.score AS BIGINT) AS authority_micro,
             deg.n_orders
      FROM a$Rounds a JOIN deg ON deg.p = a.p
      ORDER BY authority_micro DESC, part
      LIMIT $TopParts
    """
    })

  val all: Seq[GraftQuery] = Seq(q199)
}
