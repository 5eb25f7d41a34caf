package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X161 — mutual nearest neighbors over the item-similarity graph
  * (the reciprocal-best-match criterion — in embedding alignment the
  * "CSLS/mutual-NN" anchor filter of Conneau et al., "Word translation
  * without parallel data", ICLR 2018; in record linkage the classic
  * one-to-one assignment heuristic): a pair (a, b) survives iff a's
  * single best neighbor is b AND b's is a. One-directional top-1 lists
  * (X154) are asymmetric — a ubiquitous item is SOMEBODY's best
  * neighbor without reciprocating — so mutual-NN is the high-precision
  * cut used for anchor pairs, merge candidates, and duplicate-SKU
  * detection where a false link costs more than a missed one.
  *
  * Shape: X154's scored frame (basket-width-bounded pair face), one
  * per-item rank-1 window (total tie-break: cos² desc, nbr asc), then
  * a SELF-join of the rank-1 frame on the reversed pair — |items| rows
  * on each side, keyed on (item, nbr) longs. Output ≤ |items|/2 rows.
  */
object MutualKnn {

  /** q201 — reciprocal-best-match item pairs. */
  val q201 = GraftQuery(
    "q201_mutual_knn", {
      (s, d) => {
        val w = Window.partitionBy(col("item"))
          .orderBy(col("cos2_micro").desc, col("nbr"))
        // the rank-1 frame is |items|-sized but its LINEAGE is the full
        // pair face — an unmaterialized self-join would execute that
        // face twice; checkpoint once (measured 8.7 s → the face once)
        val best = graft.Checkpoints.eager(ItemSimilarity.scored(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("item"), col("nbr"), col("c"), col("cos2_micro")))
        best.as("f")
          .join(best.as("r"),
            col("f.item") === col("r.nbr") &&
              col("f.nbr") === col("r.item") &&
              col("f.item") < col("f.nbr"))
          .select(col("f.item").as("a"), col("f.nbr").as("b"),
            col("f.c").as("c"), col("f.cos2_micro").as("cos2_micro"))
          .orderBy(col("a"))
      }
    },
    Some("""
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
        SELECT d.item, d.nbr, d.c,
               d.c * d.c * 1000000 // (ia.n * ib.n) AS cos2_micro
        FROM directed d
        JOIN items ia ON ia.p = d.item
        JOIN items ib ON ib.p = d.nbr),
      best AS (
        SELECT item, nbr, c, cos2_micro FROM (
          SELECT item, nbr, c, cos2_micro,
                 ROW_NUMBER() OVER (PARTITION BY item
                   ORDER BY cos2_micro DESC, nbr) AS rn
          FROM scored)
        WHERE rn = 1)
      SELECT f.item AS a, f.nbr AS b, f.c AS c,
             CAST(f.cos2_micro AS BIGINT) AS cos2_micro
      FROM best f JOIN best r
        ON f.item = r.nbr AND f.nbr = r.item AND f.item < f.nbr
      ORDER BY a
    """))

  val all: Seq[GraftQuery] = Seq(q201)
}
