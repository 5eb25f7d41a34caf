package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X136 — ORC warehouse format tier: the second columnar format next
  * to parquet (S2/X1) — write a partitioned ORC table, read it back
  * through Spark's vectorized ORC reader, and prove the same pushdown
  * properties hold (partition-directory pruning on the partition
  * column, predicate pushdown into the stripe reader). A lakehouse
  * engine that can only read one columnar format isn't complete;
  * ORC ships in Spark core, so this is pure configuration surface —
  * the point of the operator is that EVERY downstream query plan is
  * format-agnostic (same Catalyst plan over a different FileScan).
  *
  * Scale shape: the write is one pass partitioned by the filter
  * column (directory pruning turns the q177 read into a 1/|flags|
  * directory scan); the read-side aggregate is q01's map-side-combined
  * shape. The spec walks the executed plan: PartitionFilters prune the
  * directory, PushedFilters reach the ORC stripe reader.
  *
  * Determinism: the ORC round-trip is lossless for these types
  * (long/double/string), so the oracle runs the SAME aggregate over
  * the ORIGINAL parquet in DuckDB — any round-trip corruption, type
  * drift, or partition-column mangling breaks the hash.
  */
object OrcWarehouse {

  /** Write the lineitem slice as a returnflag-partitioned ORC table;
    * returns the table path.
    */
  def writeOrc(df: org.apache.spark.sql.DataFrame, dir: String): String = {
    df.write.mode("overwrite").partitionBy("l_returnflag").orc(dir)
    dir
  }

  /** q177 — parquet → partitioned ORC → filtered aggregate, oracle'd
    * against the ORIGINAL parquet.
    */
  val q177 = GraftQuery(
    "q177_orc_roundtrip", {
      (s, d) => {
        val dir = Scratch.fresh("q177-orc") + "/lineitem_orc"
        writeOrc(t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"),
            col("l_discount")), dir)
        s.read.orc(dir)
          .filter(col("l_returnflag") === "R" && col("l_quantity") < 10)
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"),
            discSum(col("l_extendedprice"), col("l_discount"))
              .as("revenue"))
          .orderBy(col("l_linestatus"))
      }
    },
    Some("""
      SELECT l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_quantity < 10
      GROUP BY l_linestatus
      ORDER BY l_linestatus
    """))

  val all: Seq[GraftQuery] = Seq(q177)
}
