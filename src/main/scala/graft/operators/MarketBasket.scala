package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X125 — market-basket association rules (Agrawal & Srikant
  * VLDB'94's support/confidence frame, plus lift): which parts
  * co-occur in the same order more than their marginals predict —
  * the co-purchase signal every recommender/assortment stack mines,
  * and (for a training-data pipeline) the co-occurrence miner behind
  * "documents tagged A are usually also tagged B" mix audits.
  *
  * Shape: baskets = DISTINCT (order, part); the pair face is ONE
  * self-join on the basket key, so its output is Σ_o k_o·(k_o−1)/2 —
  * bounded by the basket width (≤7 items in this schema; a wide-basket
  * corpus caps k by taking each basket's top-k items first), never by
  * the corpus. Pair counts shuffle once on (a, b); the top-100
  * selection runs BEFORE the marginal join, so the join input is a
  * 100-row frame against the |parts| marginal (dimension-sized).
  *
  * Determinism: counts are exact longs; support/confidence/lift are
  * each ONE shared double tree over those longs (IEEE ×,÷ are
  * correctly rounded, so identical inputs + identical tree = identical
  * bits in both engines); ties in the top-100 broken by (a, b).
  */
object MarketBasket {

  /** Rules to keep (by pair count, ties by key). */
  val TopRules = 100

  /** q167 — top co-purchase pairs with support / confidence / lift. */
  val q167 = GraftQuery(
    "q167_basket_rules", {
      (s, d) => {
        val baskets = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val n = baskets.agg(
          countDistinct(col("o")).as("n_orders"))
        val items = baskets.groupBy(col("p"))
          .agg(count(lit(1)).as("cnt_i"))
        val pairs = baskets.as("b1")
          .join(baskets.as("b2"),
            col("b1.o") === col("b2.o") && col("b1.p") < col("b2.p"))
          .groupBy(col("b1.p").as("a"), col("b2.p").as("b"))
          .agg(count(lit(1)).as("pair_cnt"))
          .orderBy(col("pair_cnt").desc, col("a"), col("b"))
          .limit(TopRules)
        pairs
          .join(items.withColumnRenamed("p", "a")
            .withColumnRenamed("cnt_i", "cnt_a"), "a")
          .join(items.withColumnRenamed("p", "b")
            .withColumnRenamed("cnt_i", "cnt_b"), "b")
          .join(broadcast(n))
          .select(col("a"), col("b"), col("pair_cnt"),
            col("cnt_a"), col("cnt_b"),
            (col("pair_cnt").cast("double") /
              col("n_orders").cast("double")).as("support"),
            (col("pair_cnt").cast("double") /
              col("cnt_a").cast("double")).as("conf_ab"),
            (col("pair_cnt").cast("double") /
              col("cnt_b").cast("double")).as("conf_ba"),
            ((col("n_orders").cast("double") *
              col("pair_cnt").cast("double")) /
              (col("cnt_a").cast("double") *
                col("cnt_b").cast("double"))).as("lift"))
          .orderBy(col("pair_cnt").desc, col("a"), col("b"))
      }
    },
    Some(s"""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM b),
      items AS (SELECT p, COUNT(*) AS cnt_i FROM b GROUP BY 1),
      pairs AS (
        SELECT b1.p AS a, b2.p AS b, COUNT(*) AS pair_cnt
        FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p
        GROUP BY 1, 2
        ORDER BY pair_cnt DESC, a, b
        LIMIT $TopRules)
      SELECT p.a, p.b, p.pair_cnt, ia.cnt_i AS cnt_a, ib.cnt_i AS cnt_b,
             CAST(p.pair_cnt AS DOUBLE) / CAST(n.n_orders AS DOUBLE)
               AS support,
             CAST(p.pair_cnt AS DOUBLE) / CAST(ia.cnt_i AS DOUBLE)
               AS conf_ab,
             CAST(p.pair_cnt AS DOUBLE) / CAST(ib.cnt_i AS DOUBLE)
               AS conf_ba,
             (CAST(n.n_orders AS DOUBLE) * CAST(p.pair_cnt AS DOUBLE))
               / (CAST(ia.cnt_i AS DOUBLE) * CAST(ib.cnt_i AS DOUBLE))
               AS lift
      FROM pairs p
      JOIN items ia ON ia.p = p.a
      JOIN items ib ON ib.p = p.b
      CROSS JOIN n
      ORDER BY p.pair_cnt DESC, p.a, p.b
    """))

  val all: Seq[GraftQuery] = Seq(q167)
}
