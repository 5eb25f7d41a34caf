package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Q._

/** X120 — profile-drift diff: the "diff two audits" operator the X87
  * profile and X93 audit scaladocs promise — given per-column profiles
  * of a REFERENCE slice and a CURRENT slice (two ingest batches, two
  * dump snapshots, yesterday vs today), localize a regression to the
  * exact column and symptom: null flood (null ratio moved), cardinality
  * collapse (distinct count crashed — a generator or join bug), bounds
  * shift (min/max repr moved — unit changes, clock skew). The TFX
  * skew/drift-validator shape, engine-native.
  *
  * Determinism: both profiles are q138's exact machinery (counts,
  * exact distincts, native-typed min/max rendered once); drift deltas
  * are micro-unit integers; verdicts are integer comparisons against
  * frozen thresholds.
  *
  * Scale shape: one pruned per-column agg pass PER SIDE (q138's
  * anti-EXPAND discipline — no shared-scan EXPAND blowup), then a
  * |columns|-row join. The 100 TB form profiles each side once and
  * diffs stored profile rows — this operator IS that diff.
  */
object ProfileDrift {

  /** Cardinality-collapse threshold: current distinct < 20 % of
    * reference.
    */
  val CollapseNum = 1L
  val CollapseDen = 5L

  /** Null-flood threshold in micro-units (1 % absolute). */
  val NullFloodMicros = 10000L

  private def profileCol(table: DataFrame, c: String,
      render: Column => Column): DataFrame =
    table.select(col(c)).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(col(c)).as("n_distinct"),
      render(min(col(c))).as("min_repr"),
      render(max(col(c))).as("max_repr"))
      .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_repr"), col("max_repr"))

  private def profile(table: DataFrame,
      cols: Seq[(String, Column => Column)]): DataFrame =
    cols.map { case (c, r) => profileCol(table, c, r) }
      .reduce(_ unionByName _)
      .withColumn("null_mu",
        expr("(2000000 * n_nulls + n_rows) div (2 * n_rows)"))

  /** The diff of a reference slice against a current slice over the
    * same columns: per column the side-by-side stats and one verdict
    * per drift symptom.
    */
  def diff(ref: DataFrame, cur: DataFrame,
      cols: Seq[(String, Column => Column)]): DataFrame = {
    val a = profile(ref, cols).select(
      col("column_name"), col("n_rows").as("ref_rows"),
      col("null_mu").as("ref_null_mu"),
      col("n_distinct").as("ref_distinct"),
      col("min_repr").as("ref_min"), col("max_repr").as("ref_max"))
    val b = profile(cur, cols).select(
      col("column_name"), col("n_rows").as("cur_rows"),
      col("null_mu").as("cur_null_mu"),
      col("n_distinct").as("cur_distinct"),
      col("min_repr").as("cur_min"), col("max_repr").as("cur_max"))
    a.join(b, "column_name")
      .withColumn("null_delta_r",
        (abs(col("cur_null_mu") - col("ref_null_mu")).cast("double") /
          1000000.0d))
      .withColumn("null_flood",
        abs(col("cur_null_mu") - col("ref_null_mu")) >= NullFloodMicros)
      .withColumn("cardinality_collapse",
        col("cur_distinct") * CollapseDen <
          col("ref_distinct") * CollapseNum)
      .withColumn("bounds_shift",
        col("cur_min") =!= col("ref_min") ||
          col("cur_max") =!= col("ref_max"))
      .withColumn("drifted",
        col("null_flood") || col("cardinality_collapse") ||
          col("bounds_shift"))
      .select(col("column_name"), col("ref_rows"), col("cur_rows"),
        col("ref_distinct"), col("cur_distinct"),
        col("null_delta_r"), col("null_flood"),
        col("cardinality_collapse"), col("bounds_shift"), col("drifted"))
      .orderBy(col("column_name"))
  }

  /** q164 — drift diff between the even- and odd-orderkey halves of
    * lineitem (two same-distribution slices: the audit must report NO
    * null/cardinality drift and only the honest bounds jitter of a
    * random split — the negative control; the spec plants the
    * positive cases).
    */
  val q164 = GraftQuery(
    "q164_profile_drift", {
      (s, d) => {
        val li = t(s, d, "lineitem")
        val decR: Column => Column = _.cast("decimal(18,2)").cast("string")
        val raw: Column => Column = _.cast("string")
        diff(li.filter(pmod(col("l_orderkey"), lit(2L)) === 0L),
          li.filter(pmod(col("l_orderkey"), lit(2L)) === 1L),
          Seq(("l_quantity", decR), ("l_extendedprice", decR),
            ("l_returnflag", raw)))
      }
    },
    Some(s"""
      WITH ref AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0),
      cur AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1),
      pa AS (
        SELECT 'l_quantity' AS column_name, count(*) AS n_rows,
               count(*) - count(l_quantity) AS n_nulls,
               count(DISTINCT l_quantity) AS n_distinct,
               CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
                 AS min_repr,
               CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
                 AS max_repr
        FROM ref
        UNION ALL
        SELECT 'l_extendedprice', count(*),
               count(*) - count(l_extendedprice),
               count(DISTINCT l_extendedprice),
               CAST(CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR),
               CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR)
        FROM ref
        UNION ALL
        SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag),
               CAST(min(l_returnflag) AS VARCHAR),
               CAST(max(l_returnflag) AS VARCHAR)
        FROM ref),
      pb AS (
        SELECT 'l_quantity' AS column_name, count(*) AS n_rows,
               count(*) - count(l_quantity) AS n_nulls,
               count(DISTINCT l_quantity) AS n_distinct,
               CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
                 AS min_repr,
               CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
                 AS max_repr
        FROM cur
        UNION ALL
        SELECT 'l_extendedprice', count(*),
               count(*) - count(l_extendedprice),
               count(DISTINCT l_extendedprice),
               CAST(CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR),
               CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR)
        FROM cur
        UNION ALL
        SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag),
               CAST(min(l_returnflag) AS VARCHAR),
               CAST(max(l_returnflag) AS VARCHAR)
        FROM cur),
      am AS (SELECT *, (2000000 * n_nulls + n_rows) // (2 * n_rows)
               AS null_mu FROM pa),
      bm AS (SELECT *, (2000000 * n_nulls + n_rows) // (2 * n_rows)
               AS null_mu FROM pb)
      SELECT a.column_name,
             a.n_rows AS ref_rows, b.n_rows AS cur_rows,
             CAST(a.n_distinct AS BIGINT) AS ref_distinct,
             CAST(b.n_distinct AS BIGINT) AS cur_distinct,
             CAST(abs(b.null_mu - a.null_mu) AS DOUBLE) / 1000000.0
               AS null_delta_r,
             abs(b.null_mu - a.null_mu) >= $NullFloodMicros AS null_flood,
             b.n_distinct * $CollapseDen < a.n_distinct * $CollapseNum
               AS cardinality_collapse,
             b.min_repr <> a.min_repr OR b.max_repr <> a.max_repr
               AS bounds_shift,
             (abs(b.null_mu - a.null_mu) >= $NullFloodMicros)
               OR (b.n_distinct * $CollapseDen
                   < a.n_distinct * $CollapseNum)
               OR (b.min_repr <> a.min_repr OR b.max_repr <> a.max_repr)
               AS drifted
      FROM am a JOIN bm b ON a.column_name = b.column_name
      ORDER BY a.column_name
    """))

  val all: Seq[GraftQuery] = Seq(q164)
}
