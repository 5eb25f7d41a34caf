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

  /** One peel round: drop edges touching any node of degree < k.
    *
    * The surviving-node frame is BROADCAST-hinted: it is |nodes|-sized
    * (two longs a row), and without the hint it sits just past AQE's
    * threshold at the 60M-row tier, turning each round into TWO
    * sort-merge passes over the full edge frame — the first probe
    * measured exponent 1.71 at sf10 (800 s) from exactly those 12
    * sorts; broadcast semi-joins make each round one scan. At true
    * 100 TB node counts the broadcast stops fitting and the
    * alternate-key co-partitioned form (or Montresor's message-passing
    * k-core) replaces it — documented, not faked.
    */
  def peel(e: DataFrame, k: Int): DataFrame = {
    val keep = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= k).select(col("src").as("node"))
    e.join(broadcast(keep.withColumnRenamed("node", "src")),
        Seq("src"), "left_semi")
      .join(broadcast(keep.withColumnRenamed("node", "dst")),
        Seq("dst"), "left_semi")
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
        // early-exit at the fixpoint: peeling is monotone, so a round
        // that removes nothing proves every later round removes
        // nothing — the result is BIT-IDENTICAL to running all six
        // (the count is free: the eager checkpoint materialized the
        // round anyway)
        var prev = e.count()
        var round = 0
        var stable = false
        while (round < Rounds && !stable) {
          round += 1
          e = graft.Checkpoints.eager(peel(e, K))
          val cnt = e.count()
          stable = cnt == prev
          prev = cnt
        }
        e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_degree"))
          .orderBy(col("node"))
      }
    },
    Some {
      // every e_r CTE is referenced 3× by round r+1 (once directly,
      // twice through k_{r+1}) — inlined, the unrolled query would
      // re-evaluate e0's self-join 3^6 times (observed: DuckDB spilled
      // >76 GB of temp at sf0.1); MATERIALIZED pins each round to one
      // evaluation, the same shape the Spark side checkpoints
      val prelude = """
      WITH b AS MATERIALIZED (
                 SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                 FROM lineitem),
      und AS MATERIALIZED (
              SELECT DISTINCT b1.p AS u, b2.p AS v
              FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p),
      e0 AS MATERIALIZED (
             SELECT u AS src, v AS dst FROM und
             UNION ALL SELECT v, u FROM und)"""
      val rounds = (1 to Rounds).map { r =>
        s"""
      k$r AS MATERIALIZED (
              SELECT src AS node FROM e${r - 1}
              GROUP BY 1 HAVING COUNT(*) >= $K),
      e$r AS MATERIALIZED (
              SELECT e.src, e.dst FROM e${r - 1} e
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
