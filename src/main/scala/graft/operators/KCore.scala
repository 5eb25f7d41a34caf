package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X150 — k-core decomposition by iterative peeling (Seidman,
  * "Network structure and minimum degree", Social Networks 1983;
  * the MapReduce peel is Montresor et al.'s distributed k-core): keep
  * deleting nodes of degree < k until the remainder — the k-core — is
  * stable. The density-community primitive between X24's components
  * (connectivity only) and X126's triangles (clique-ish-ness):
  * spam/bot rings and genuine communities both surface as cores the
  * wider graph lacks.
  *
  * FIXED peel rounds (the X65/X133/X144 replay discipline): each
  * round recomputes degrees and semi-joins the edge list on surviving
  * endpoints — both engines run the SAME unrolled rounds, so the
  * result is bit-deterministic even before the fixpoint; KCoreSpec
  * asserts the fixpoint IS reached on the test graphs (one more round
  * changes nothing) so the fixed count is a measured bound, not hope.
  *
  * Scale shape: per round one map-side-combined degree groupBy + two
  * semi-joins keyed on node ids — every shuffle carries (long, long)
  * rows; the peel terminates in ≤ diameter-ish rounds and each round
  * SHRINKS the edge frame monotonically.
  */
object KCore {

  val K = 3

  /** Fixed peel-round count (spec-verified fixpoint at test scales). */
  val Rounds = 6

  /** One peel round: drop edges touching any node of degree < k. */
  def peel(e: DataFrame, k: Int): DataFrame = {
    val keep = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= k).select(col("src").as("node"))
    e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
  }

  /** q191 — the 3-core of the co-purchase graph after 6 peel rounds:
    * surviving nodes with their in-core degrees.
    */
  val q191 = GraftQuery(
    "q191_kcore", {
      (s, d) => {
        GraphScale(s, d)
        val baskets = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val und = TriangleCount.undirectedEdges(baskets)
        var e = graft.Checkpoints.eager(
          und.select(col("u").as("src"), col("v").as("dst"))
            .union(und.select(col("v").as("src"), col("u").as("dst")))
            .repartition(col("src")))
        (1 to Rounds).foreach { _ =>
          e = graft.Checkpoints.eager(peel(e, K))
        }
        e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_degree"))
          .orderBy(col("node"))
      }
    },
    Some {
      val prelude = """
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      und AS (SELECT DISTINCT b1.p AS u, b2.p AS v
              FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p),
      e0 AS (SELECT u AS src, v AS dst FROM und
             UNION ALL SELECT v, u FROM und)"""
      val rounds = (1 to Rounds).map { r =>
        s"""
      k$r AS (SELECT src AS node FROM e${r - 1}
              GROUP BY 1 HAVING COUNT(*) >= $K),
      e$r AS (SELECT e.src, e.dst FROM e${r - 1} e
              JOIN k$r a ON a.node = e.src
              JOIN k$r b2 ON b2.node = e.dst)"""
      }.mkString(",")
      s"""$prelude,$rounds
      SELECT src AS node, COUNT(*) AS core_degree
      FROM e$Rounds GROUP BY 1 ORDER BY 1
    """
    })

  val all: Seq[GraftQuery] = Seq(q191)
}
