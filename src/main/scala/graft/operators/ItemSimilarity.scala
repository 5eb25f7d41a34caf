package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X154 — item-item collaborative filtering (Sarwar, Karypis, Konstan
  * & Riedl, "Item-based collaborative filtering recommendation
  * algorithms", WWW 2001): for every item, its top-k most similar
  * items by co-occurrence cosine — the "customers also bought"
  * materialization, and for a curation stack the related-tags/
  * related-sources table that X125's global rule list (one top-100
  * across the whole catalog) does not give: X125 ranks PAIRS, this
  * ranks NEIGHBORS per item.
  *
  * Formulation: over binary baskets, cosine(i,j) = c_ij / √(n_i·n_j).
  * The √ would put an irrational into the hash, so similarity is
  * carried as cos² in exact integer micro-units — c²·10⁶ div
  * (n_i·n_j), an order-free integer for both engines — which is a
  * MONOTONE transform of cosine, so the top-k by (cos²_micro desc,
  * neighbor asc) is the top-k by cosine with a total tie-break.
  *
  * Shape: the pair face is X125's — one self-join on the basket key,
  * output Σ_o k_o(k_o−1)/2 bounded by basket width (wide-basket
  * corpora cap k per basket first), pair counts shuffle once on the
  * pair key. Marginals attach by TWO dimension joins (item-count
  * frame), then the per-item ranking window runs on the pair frame
  * (≤ basket-width·|items| rows of longs). Output = ≤ k·|items| rows.
  */
object ItemSimilarity {

  /** Neighbors kept per item. */
  val TopK = 3

  /** The directed scored-neighbor frame (item, nbr, c, n_item, n_nbr,
    * cos2_micro) — shared by q195's top-k and X161's mutual-NN cut.
    */
  def scored(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val baskets = t(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val items = baskets.groupBy(col("p"))
      .agg(count(lit(1)).as("n"))
    val pairs = baskets.as("b1")
      .join(baskets.as("b2"),
        col("b1.o") === col("b2.o") && col("b1.p") < col("b2.p"))
      .groupBy(col("b1.p").as("a"), col("b2.p").as("b"))
      .agg(count(lit(1)).as("c"))
    val directed = pairs.select(col("a").as("item"),
        col("b").as("nbr"), col("c"))
      .union(pairs.select(col("b").as("item"),
        col("a").as("nbr"), col("c")))
    directed
      .join(items.withColumnRenamed("p", "item")
        .withColumnRenamed("n", "n_item"), "item")
      .join(items.withColumnRenamed("p", "nbr")
        .withColumnRenamed("n", "n_nbr"), "nbr")
      .withColumn("cos2_micro",
        expr("c * c * 1000000 div (n_item * n_nbr)"))
  }

  /** q195 — per-item top-k co-occurrence cosine neighbors. */
  val q195 = GraftQuery(
    "q195_item_similarity", {
      (s, d) => {
        val w = Window.partitionBy(col("item"))
          .orderBy(col("cos2_micro").desc, col("nbr"))
        scored(s, d)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= TopK)
          .select(col("item"), col("rank"), col("nbr"), col("c"),
            col("n_item"), col("n_nbr"), col("cos2_micro"))
          .orderBy(col("item"), col("rank"))
      }
    },
    Some(s"""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      items AS (SELECT p, COUNT(*) AS n FROM b GROUP BY 1),
      pairs AS (
        SELECT b1.p AS a, b2.p AS b, COUNT(*) AS c
        FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p
        GROUP BY 1, 2),
      directed AS (
        SELECT a AS item, b AS nbr, c FROM pairs
        UNION ALL
        SELECT b, a, c FROM pairs),
      scored AS (
        SELECT d.item, d.nbr, d.c, ia.n AS n_item, ib.n AS n_nbr,
               d.c * d.c * 1000000 // (ia.n * ib.n) AS cos2_micro
        FROM directed d
        JOIN items ia ON ia.p = d.item
        JOIN items ib ON ib.p = d.nbr),
      ranked AS (
        SELECT item, nbr, c, n_item, n_nbr, cos2_micro,
               ROW_NUMBER() OVER (PARTITION BY item
                 ORDER BY cos2_micro DESC, nbr) AS rank
        FROM scored)
      SELECT item, rank, nbr, c, n_item, n_nbr,
             CAST(cos2_micro AS BIGINT) AS cos2_micro
      FROM ranked
      WHERE rank <= $TopK
      ORDER BY item, rank
    """))

  val all: Seq[GraftQuery] = Seq(q195)
}
