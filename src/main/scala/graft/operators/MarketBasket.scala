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

  /** The shared top-pair frame: (a, b, pair_cnt, cnt_a, cnt_b,
    * n_orders) for the top-[[TopRules]] pairs — q167 reads it into
    * the support/confidence/lift panel, q242 into the null-invariant
    * interestingness panel. Extracting the method leaves both plans
    * identical to inlining it (same operator tree).
    */
  private def topPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val baskets = t(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val n = baskets.agg(countDistinct(col("o")).as("n_orders"))
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
  }

  /** The shared top-pair CTE block (DuckDB mirror of [[topPairs]]),
    * ending in a `tp(a, b, pair_cnt, cnt_a, cnt_b, n_orders)`
    * relation.
    */
  private val topPairsSql: String = s"""
      b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM b),
      items AS (SELECT p, COUNT(*) AS cnt_i FROM b GROUP BY 1),
      pairs AS (
        SELECT b1.p AS a, b2.p AS b, COUNT(*) AS pair_cnt
        FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p
        GROUP BY 1, 2
        ORDER BY pair_cnt DESC, a, b
        LIMIT $TopRules),
      tp AS (
        SELECT p.a, p.b, p.pair_cnt, ia.cnt_i AS cnt_a,
               ib.cnt_i AS cnt_b, n.n_orders
        FROM pairs p
        JOIN items ia ON ia.p = p.a
        JOIN items ib ON ib.p = p.b
        CROSS JOIN n)"""

  /** q167 — top co-purchase pairs with support / confidence / lift. */
  val q167 = GraftQuery(
    "q167_basket_rules", {
      (s, d) => {
        topPairs(s, d)
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

  /** X209 / q242 — NULL-INVARIANT interestingness panel for the same
    * top rules (Wu, Chen & Han 2010's re-examination; Han & Kamber
    * ch. 6): lift inflates when co-ABSENCE is common (its
    * denominator sees the whole basket universe), so large sparse
    * catalogs rank rules by measures that ignore null transactions —
    *   Kulczynski = (conf_ab + conf_ba)/2,
    *   cosine     = pair/√(cnt_a·cnt_b)   (IEEE sqrt, one tree),
    *   imbalance  = |cnt_a − cnt_b| / (cnt_a + cnt_b − pair)
    * — Kulc ≈ 0.5 with high IR is the "interesting but one-sided"
    * signature lift cannot see. Same shared frame as q167 (one
    * extraction, two panels); all leaves exact longs, each measure
    * one fixed double tree.
    */
  val q242 = GraftQuery(
    "q242_rule_interestingness", {
      (s, d) => {
        topPairs(s, d)
          .select(col("a"), col("b"), col("pair_cnt"),
            col("cnt_a"), col("cnt_b"),
            ((col("pair_cnt").cast("double") /
              col("cnt_a").cast("double") +
              col("pair_cnt").cast("double") /
                col("cnt_b").cast("double")) / 2.0).as("kulc"),
            (col("pair_cnt").cast("double") /
              sqrt((col("cnt_a") * col("cnt_b")).cast("double")))
              .as("cosine"),
            (abs(col("cnt_a") - col("cnt_b")).cast("double") /
              (col("cnt_a") + col("cnt_b") - col("pair_cnt"))
                .cast("double")).as("imbalance"))
          .orderBy(col("pair_cnt").desc, col("a"), col("b"))
      }
    },
    Some(s"""
      WITH $topPairsSql
      SELECT a, b, pair_cnt, cnt_a, cnt_b,
             (CAST(pair_cnt AS DOUBLE) / CAST(cnt_a AS DOUBLE)
              + CAST(pair_cnt AS DOUBLE) / CAST(cnt_b AS DOUBLE)) / 2.0
               AS kulc,
             CAST(pair_cnt AS DOUBLE)
               / sqrt(CAST(cnt_a * cnt_b AS DOUBLE)) AS cosine,
             CAST(ABS(cnt_a - cnt_b) AS DOUBLE)
               / CAST(cnt_a + cnt_b - pair_cnt AS DOUBLE) AS imbalance
      FROM tp
      ORDER BY pair_cnt DESC, a, b
    """))

  val all: Seq[GraftQuery] = Seq(q167, q242)
}
