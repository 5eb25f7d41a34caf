package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** X169 — approximate functional-dependency audit (Huhtala et al.'s
  * TANE, Comput. J. 1999, and Kivinen-Mannila's g3 error measure,
  * TCS 1995): for each candidate dependency LHS → RHS, does the data
  * actually satisfy it, and if not, HOW broken is it? The schema-
  * inference / data-contract companion to X139: X139 checks declared
  * contracts (FK/PK/null/range), this measures which undeclared
  * column dependencies hold — the audit that catches "order priority
  * silently stopped being a function of the customer" or validates a
  * proposed normalization before a 100 TB backfill assumes it.
  *
  * Per candidate FD the output carries, all exact integers:
  *   - n_rows, n_lhs (distinct LHS values),
  *   - n_violating_lhs — LHS groups with > 1 distinct RHS,
  *   - g3_rows — the Kivinen-Mannila minimum-deletion count:
  *     n_rows − Σ_lhs max_rhs count(lhs, rhs). g3 = 0 iff the FD
  *     holds exactly; it is the number of rows an enforcing cleaner
  *     would drop, the actionable size of the breach.
  *
  * Scale shape: per FD one two-level aggregation — groupBy (lhs, rhs)
  * with map-side combine (the frame is ≤ |lhs|·|rhs-per-lhs|, tiny
  * after partial aggregation), then a groupBy lhs on THAT frame, then
  * a 1-row summary. No joins, no windows on base data; each candidate
  * is one scan of its table with only the two audited columns read
  * (column pruning reaches the parquet scan). Candidates over the
  * same table could share one scan via grouping-sets if the list
  * grew; at four candidates the plain union is the clearer plan.
  */
object FdAudit {

  /** Candidate dependencies: (name, table, lhs column, rhs column).
    * Chosen to span the spectrum: a true key-FD, a dimension FD that
    * holds by construction, and two that genuinely fail on this
    * generator (measured g3 > 0), so the operator demonstrates both
    * verdicts against the oracle.
    */
  val Candidates: Seq[(String, String, String, String)] = Seq(
    ("cust_to_priority", "orders", "o_custkey", "o_orderpriority"),
    ("brand_to_type", "part", "p_brand", "p_type"),
    ("order_to_flag", "lineitem", "l_orderkey", "l_returnflag"),
    ("part_to_supp", "lineitem", "l_partkey", "l_suppkey"))

  /** One summary row for LHS → RHS over `df`. */
  def audit(df: DataFrame, fd: String, lhs: String, rhs: String)
      : DataFrame = {
    val pairs = df.groupBy(col(lhs).as("l"), col(rhs).as("r"))
      .agg(count(lit(1)).as("cnt"))
    pairs.groupBy(col("l"))
      .agg(count(lit(1)).as("n_rhs"), max(col("cnt")).as("keep"),
        sum(col("cnt")).as("n"))
      .agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_lhs"),
        sum(when(col("n_rhs") > 1, 1L).otherwise(0L))
          .as("n_violating_lhs"),
        (sum(col("n")) - sum(col("keep"))).as("g3_rows"))
      .select(lit(fd).as("fd"), col("n_rows"), col("n_lhs"),
        col("n_violating_lhs"), col("g3_rows"),
        (col("g3_rows") === 0).as("holds"))
  }

  /** q208 — the four-candidate FD audit across the warehouse. */
  val q208 = GraftQuery(
    "q208_fd_audit", {
      (s: SparkSession, d: String) =>
        Candidates
          .map { case (fd, table, lhs, rhs) =>
            audit(t(s, d, table), fd, lhs, rhs)
          }
          .reduce(_ unionByName _)
          .orderBy(col("fd"))
    },
    Some {
      val arms = Candidates.map { case (fd, table, lhs, rhs) =>
        s"""
      SELECT '$fd' AS fd,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             COUNT(*) AS n_lhs,
             CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_lhs,
             CAST(SUM(n) - SUM(keep) AS BIGINT) AS g3_rows,
             SUM(n) - SUM(keep) = 0 AS holds
      FROM (
        SELECT l, COUNT(*) AS n_rhs, MAX(cnt) AS keep, SUM(cnt) AS n
        FROM (
          SELECT $lhs AS l, $rhs AS r, COUNT(*) AS cnt
          FROM $table GROUP BY 1, 2)
        GROUP BY l)"""
      }.mkString(" UNION ALL ")
      s"SELECT * FROM ($arms) ORDER BY fd"
    })

  val all: Seq[GraftQuery] = Seq(q208)
}
