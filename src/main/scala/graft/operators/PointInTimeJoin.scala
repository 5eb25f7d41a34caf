package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X163 — point-in-time dimension join (the feature-store temporal
  * correctness operator — Kimball's "late-arriving fact against a
  * type-2 dimension", the PIT join every feature platform ships
  * because training on CURRENT dimension values leaks the future into
  * the features): each fact row joins the dimension version that was
  * valid AT ITS OWN timestamp, not the latest one.
  *
  * Concretely: the customer's order-priority history is the SCD2
  * change log (X106 collapse over (o_orderdate, o_orderkey)); facts
  * are lineitem shipments at l_shipdate. A shipment's priority-as-of-
  * ship-date can differ BOTH from its own order's priority (the
  * customer placed a higher-priority order in between) and from the
  * customer's current priority (later orders changed it again) — the
  * output carries revenue under all three attributions so the leakage
  * is a visible delta, not an assertion.
  *
  * Plan (the X13 as-of idiom — ONE union + ONE per-key window, no
  * interval multiplication): dimension OPENS and facts union into one
  * frame keyed by custkey, totally ordered by (ts, kind, keys) with
  * opens sorting BEFORE facts at the same instant (half-open [from,
  * next) semantics, same-instant change applies); one last-non-null
  * window carries the valid attribute onto each fact. The fact⋈orders
  * FK join (for custkey) is orderkey-co-partitioned; everything else
  * shuffles once on custkey. All money in exact DECIMAL.
  */
object PointInTimeJoin {

  /** q203 — lineitem revenue per priority under point-in-time vs
    * own-order vs current-dimension attribution.
    */
  val q203 = GraftQuery(
    "q203_point_in_time_join", {
      (s, d) => {
        val wOrd = Window.partitionBy(col("cust"))
          .orderBy(col("ts"), col("okey"))
        val orders = t(s, d, "orders").select(
          col("o_custkey").as("cust"), col("o_orderkey").as("okey"),
          col("o_orderdate").as("ts"), col("o_orderpriority").as("attr"))
        // SCD2 collapse: keep priority CHANGES only
        val opens = orders
          .withColumn("prev", lag(col("attr"), 1).over(wOrd))
          .filter(col("prev").isNull || col("attr") =!= col("prev"))
          .select(col("cust"), col("ts"), lit(0).as("kind"),
            col("okey").as("k1"), lit(0).as("k2"), col("attr"),
            lit(null).cast("string").as("own_attr"),
            lit(null).cast("decimal(37,4)").as("rev"))
        val wCur = Window.partitionBy(col("cust"))
          .orderBy(col("ts").desc, col("okey").desc)
        val current = orders
          .withColumn("rn", row_number().over(wCur))
          .filter(col("rn") === 1)
          .select(col("cust"), col("attr").as("cur_attr"))
        val facts = t(s, d, "lineitem")
          .join(t(s, d, "orders").select(col("o_orderkey"),
            col("o_custkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"),
            col("l_shipdate").as("ts"), lit(1).as("kind"),
            col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
            lit(null).cast("string").as("attr"),
            col("o_orderpriority").as("own_attr"),
            // FULL-precision product — no intermediate decimal
            // downcast: Spark rounds HALF_UP, DuckDB truncates, so a
            // (18,2) re-cast would diverge on .xx5 ties (Q.scala rule)
            (dec(col("l_extendedprice")) *
              (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
              .as("rev"))
        val wPit = Window.partitionBy(col("cust"))
          .orderBy(col("ts"), col("kind"), col("k1"), col("k2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // ~47 % of this generator's lineitems ship BEFORE their order
        // date, so a fact can precede every dimension version — that is
        // the real-world "no feature value yet" case a feature platform
        // must surface, not hide: it gets the explicit 0-NONE bucket
        opens.unionByName(facts)
          .withColumn("pit_attr", coalesce(
            last(col("attr"), ignoreNulls = true).over(wPit),
            lit("0-NONE")))
          .filter(col("kind") === 1)
          .join(current, Seq("cust"))
          .groupBy(col("pit_attr").as("priority"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("rev")).cast("double").as("revenue_pit"),
            sum(when(col("own_attr") === col("pit_attr"), col("rev")))
              .cast("double").as("revenue_pit_and_own"),
            sum(when(col("cur_attr") === col("pit_attr"), col("rev")))
              .cast("double").as("revenue_pit_and_current"))
          .orderBy(col("priority"))
      }
    },
    Some("""
      WITH ord AS (
        SELECT o_custkey AS cust, o_orderkey AS okey,
               o_orderdate AS ts, o_orderpriority AS attr
        FROM orders),
      opens AS (
        SELECT cust, ts, 0 AS kind, okey AS k1, 0 AS k2, attr,
               CAST(NULL AS VARCHAR) AS own_attr,
               CAST(NULL AS DECIMAL(36,4)) AS rev
        FROM (SELECT cust, okey, ts, attr,
                     lag(attr) OVER (PARTITION BY cust
                       ORDER BY ts, okey) AS prev
              FROM ord)
        WHERE prev IS NULL OR attr <> prev),
      cur AS (
        SELECT cust, attr AS cur_attr FROM (
          SELECT cust, attr, ROW_NUMBER() OVER (PARTITION BY cust
            ORDER BY ts DESC, okey DESC) AS rn
          FROM ord)
        WHERE rn = 1),
      facts AS (
        SELECT o.o_custkey AS cust, l.l_shipdate AS ts, 1 AS kind,
               l.l_orderkey AS k1, l.l_linenumber AS k2,
               CAST(NULL AS VARCHAR) AS attr,
               o.o_orderpriority AS own_attr,
               CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) -
                  CAST(l.l_discount AS DECIMAL(18,2))) AS rev
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      unioned AS (
        SELECT * FROM opens UNION ALL SELECT * FROM facts),
      carried AS (
        SELECT cust, kind, own_attr, rev,
               COALESCE(last_value(attr IGNORE NULLS) OVER (
                 PARTITION BY cust ORDER BY ts, kind, k1, k2
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 '0-NONE') AS pit_attr
        FROM unioned)
      SELECT c.pit_attr AS priority, COUNT(*) AS n_items,
             CAST(SUM(c.rev) AS DOUBLE) AS revenue_pit,
             CAST(SUM(CASE WHEN c.own_attr = c.pit_attr THEN c.rev END)
               AS DOUBLE) AS revenue_pit_and_own,
             CAST(SUM(CASE WHEN cur.cur_attr = c.pit_attr THEN c.rev END)
               AS DOUBLE) AS revenue_pit_and_current
      FROM carried c JOIN cur ON cur.cust = c.cust
      WHERE c.kind = 1
      GROUP BY 1
      ORDER BY priority
    """))

  val all: Seq[GraftQuery] = Seq(q203)
}
