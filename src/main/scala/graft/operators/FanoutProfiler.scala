package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** X188 — FK fan-out profiler (the join-cardinality census a
  * migration or pipeline team runs BEFORE a join-heavy backfill;
  * the statistics a CBO keeps, surfaced as an audit): for each
  * declared FK edge child→parent, the exact fan-out distribution —
  * parents, children, orphan children (FK rows with no parent),
  * childless parents, min/max children per matched parent, and the
  * mean as one double division. X139 asserts FK integrity as a
  * boolean contract; X169 measures column dependencies; this
  * measures the JOIN SHAPE — the number that predicts whether the
  * backfill's join explodes, broadcasts, or skews (max_children IS
  * the skew bound).
  *
  * Per edge: one map-side child groupBy to the |parents'| key frame,
  * one full-outer join with the parent key set (both sides key
  * frames, never fact-sized on the parent side), one 1-row summary.
  * All counts exact longs.
  */
object FanoutProfiler {

  /** Declared edges: (name, child table, FK col, parent table, PK). */
  val Edges: Seq[(String, String, String, String, String)] = Seq(
    ("lineitem_orders", "lineitem", "l_orderkey", "orders",
      "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders_customer", "orders", "o_custkey", "customer",
      "c_custkey"),
    ("customer_nation", "customer", "c_nationkey", "nation",
      "n_nationkey"))

  /** One summary row for child.fk → parent.pk. */
  def profile(child: DataFrame, fk: String, parent: DataFrame,
      pk: String, edge: String): DataFrame = {
    val perKey = child.groupBy(col(fk).as("k"))
      .agg(count(lit(1)).as("c"))
    val joined = parent.select(col(pk).as("p")).distinct()
      .join(perKey, col("p") === col("k"), "full_outer")
    joined.agg(
      sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n_parents"),
      sum(coalesce(col("c"), lit(0L))).as("n_children"),
      sum(when(col("p").isNull, col("c")).otherwise(0L))
        .as("orphan_children"),
      sum(when(col("p").isNotNull && col("c").isNull, 1L)
        .otherwise(0L)).as("childless_parents"),
      min(when(col("p").isNotNull, coalesce(col("c"), lit(0L))))
        .as("min_children"),
      max(when(col("p").isNotNull, coalesce(col("c"), lit(0L))))
        .as("max_children"))
      .select(lit(edge).as("edge"), col("n_parents"), col("n_children"),
        col("orphan_children"), col("childless_parents"),
        col("min_children"), col("max_children"),
        // ANSI guard: an empty parent table must yield NULL, not a
        // divide-by-zero failure of the whole q225 union.
        when(col("n_parents") > 0,
          (col("n_children") - col("orphan_children")).cast("double") /
            col("n_parents").cast("double")).as("mean_children"))
  }

  /** q225 — the fan-out census over the declared FK edges. */
  val q225 = GraftQuery(
    "q225_fanout_profiler", {
      (s: SparkSession, d: String) =>
        Edges.map { case (edge, ct, fk, pt, pk) =>
          profile(t(s, d, ct), fk, t(s, d, pt), pk, edge)
        }.reduce(_ unionByName _).orderBy(col("edge"))
    },
    Some {
      val arms = Edges.map { case (edge, ct, fk, pt, pk) =>
        s"""
      SELECT '$edge' AS edge,
             CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_parents,
             CAST(SUM(COALESCE(c, 0)) AS BIGINT) AS n_children,
             CAST(SUM(CASE WHEN p IS NULL THEN c ELSE 0 END)
               AS BIGINT) AS orphan_children,
             CAST(SUM(CASE WHEN p IS NOT NULL AND c IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS childless_parents,
             CAST(MIN(CASE WHEN p IS NOT NULL THEN COALESCE(c, 0) END)
               AS BIGINT) AS min_children,
             CAST(MAX(CASE WHEN p IS NOT NULL THEN COALESCE(c, 0) END)
               AS BIGINT) AS max_children,
             CASE WHEN SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) > 0
               THEN CAST(SUM(COALESCE(c, 0)) -
                      SUM(CASE WHEN p IS NULL THEN c ELSE 0 END)
                    AS DOUBLE) /
                    CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE)
             END AS mean_children
      FROM (
        SELECT p, c FROM
          (SELECT DISTINCT $pk AS p FROM $pt) par
        FULL OUTER JOIN
          (SELECT $fk AS k, COUNT(*) AS c FROM $ct GROUP BY 1) ch
        ON par.p = ch.k)"""
      }.mkString(" UNION ALL ")
      s"SELECT * FROM ($arms) ORDER BY edge"
    })

  val all: Seq[GraftQuery] = Seq(q225)
}
