package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** Core relational surface (SURVEY.md §2.2, §2.4–§2.6): projection/filter,
  * hash aggregation, joins of every flavor, set ops, window functions,
  * rollup, top-k, scalar expression coverage.
  *
  * All queries are built with the DataFrame API so Catalyst handles
  * pushdown/pruning/join selection; small dimensions are explicitly
  * broadcast. Every query is fully deterministic (total ORDER BY, exact
  * decimal aggregation of doubles).
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: filter → hash agg (partial+final) →
    * sort. [D2/D3, X7] Scan should show PushedFilters on l_shipdate.
    */
  val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          discSum(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  /** Predicate coverage: =, <, BETWEEN, IN, LIKE in one scan. [D1] */
  val q02 = GraftQuery(
    "q02_filter_predicates",
    (s, d) =>
      t(s, d, "part")
        .filter(
          col("p_size").between(10, 25) &&
            col("p_brand").isin("Brand#1", "Brand#7", "Brand#13", "Brand#25") &&
            col("p_name").like("%e%") &&
            col("p_type") =!= "ECONOMY" &&
            col("p_retailprice") < 1800.0)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"), col("p_retailprice"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
      FROM part
      WHERE p_size BETWEEN 10 AND 25
        AND p_brand IN ('Brand#1','Brand#7','Brand#13','Brand#25')
        AND p_name LIKE '%e%'
        AND p_type <> 'ECONOMY'
        AND p_retailprice < 1800.0
      ORDER BY p_partkey
    """))

  /** Inner equi-join + agg. Customer is deliberately NOT hinted: it is
    * the one dimension that scales linearly with SF (SF×150k rows), and
    * an explicit broadcast hint is honored regardless of
    * `autoBroadcastJoinThreshold`, so a hint here would collect a
    * multi-GB table to the driver at 100×. AQE still picks a broadcast
    * join at small SF on its own. [X8, D3]
    */
  val q03 = GraftQuery(
    "q03_join_segment_revenue",
    (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy(col("c_mktsegment")),
    Some("""
      SELECT c_mktsegment,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders,
             COUNT(DISTINCT c_custkey) AS n_customers
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """))

  /** TPC-H Q5-style 5-way join with region filter: the big fact table joins
    * shuffle on keys; nation/region (fixed 25/5 rows at ANY SF) are
    * broadcast-hinted, customer (scales with SF) is left to AQE — see q03.
    * [X8]
    */
  val q04 = GraftQuery(
    "q04_nation_revenue",
    (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          discSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name")),
    Some("""
      SELECT r_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA','EUROPE')
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """))

  /** Left outer join keeping customers with zero orders, then a second agg:
    * distribution of per-customer order counts. [X8]
    */
  val q05 = GraftQuery(
    "q05_order_count_histogram",
    (s, d) => {
      val perCust = t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
      perCust
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_orders"))
    },
    Some("""
      SELECT n_orders, COUNT(*) AS n_customers
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      GROUP BY n_orders
      ORDER BY n_orders
    """))

  /** Left-semi join (EXISTS): customers having a high-value order. [X9] */
  val q06 = GraftQuery(
    "q06_semi_join",
    (s, d) =>
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment")),
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """))

  /** Left-anti join (NOT EXISTS): customers with no urgent order. [X9] */
  val q07 = GraftQuery(
    "q07_anti_join",
    (s, d) =>
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey
    """))

  /** Ranking window: top-3 orders per customer by price (row_number with a
    * deterministic orderkey tiebreak). [X13]
    */
  val q08 = GraftQuery(
    "q08_window_topk_per_customer",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn
    """))

  /** Analytic windows: lag + running sum per user over event time. [X14]
    * Running sum uses exact decimal arithmetic; cast to double at the end.
    */
  val q09 = GraftQuery(
    "q09_window_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_event",
          lag(col("event_type"), 1).over(w))
        .withColumn("running_value",
          sum(col("value").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("prev_event"), col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, event_type,
             LAG(event_type, 1) OVER w AS prev_event,
             CAST(SUM(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id
    """))

  /** Set operations: UNION / INTERSECT / EXCEPT over two key predicates,
    * tagged and counted so one result covers all three. [X12]
    */
  val q10 = GraftQuery(
    "q10_set_ops",
    (s, d) => {
      val bigSpenders = t(s, d, "orders")
        .filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("custkey")).distinct()
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")).distinct()
      val u = bigSpenders.union(urgent).distinct()
        .agg(count(lit(1)).as("n")).withColumn("op", lit("union"))
      val i = bigSpenders.intersect(urgent)
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
      val e = bigSpenders.except(urgent)
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
      u.union(i).union(e).select(col("op"), col("n")).orderBy(col("op"))
    },
    Some("""
      WITH big AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                   WHERE o_totalprice > 250000.0),
           urg AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                   WHERE o_orderpriority = '1-URGENT')
      SELECT op, n FROM (
        SELECT 'union' AS op, COUNT(*) AS n
          FROM (SELECT custkey FROM big UNION SELECT custkey FROM urg)
        UNION ALL
        SELECT 'intersect', COUNT(*)
          FROM (SELECT custkey FROM big INTERSECT SELECT custkey FROM urg)
        UNION ALL
        SELECT 'except', COUNT(*)
          FROM (SELECT custkey FROM big EXCEPT SELECT custkey FROM urg))
      ORDER BY op
    """))

  /** Hierarchical rollup (grand total + per-flag subtotals). [X5, D6] */
  val q11 = GraftQuery(
    "q11_rollup",
    (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """))

  /** Global top-k: ORDER BY … LIMIT compiles to TakeOrderedAndProject — no
    * full sort of the fact table. [D7]
    */
  val q12 = GraftQuery(
    "q12_topk_orders",
    (s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate")),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 25
    """))

  /** Global aggregates incl. exact distinct counts. [D5] */
  val q13 = GraftQuery(
    "q13_global_aggregates",
    (s, d) =>
      t(s, d, "lineitem").agg(
        dsum(col("l_quantity")).as("total_qty"),
        dsum(col("l_extendedprice")).as("total_price"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows")),
    Some("""
      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
             MIN(l_shipdate) AS first_ship,
             MAX(l_shipdate) AS last_ship,
             COUNT(DISTINCT l_orderkey) AS n_orders,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(*) AS n_rows
      FROM lineitem
    """))

  /** Event-time bucketing: per-hour-of-stream × type counts. [D4]
    * date_trunc('hour') is TIMESTAMP in both engines.
    */
  val q14 = GraftQuery(
    "q14_time_bucket_agg",
    (s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("bucket"), col("event_type")),
    Some("""
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket, event_type
    """))

  /** String scalar coverage: concat/upper/lower/substring/length/trim/lpad/
    * replace/split-count. [X2] DuckDB length() is BIGINT → cast.
    */
  val q15 = GraftQuery(
    "q15_scalar_string",
    (s, d) =>
      t(s, d, "customer")
        .filter(col("c_custkey") < 200)
        .select(
          col("c_custkey"),
          concat(upper(col("c_mktsegment")), lit(":"), col("c_name"))
            .as("tag"),
          lower(col("c_name")).as("lname"),
          substring(col("c_name"), 10, 9).as("id_part"),
          length(col("c_name")).as("name_len"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "0+", "0").as("squeezed"))
        .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey,
             upper(c_mktsegment) || ':' || c_name AS tag,
             lower(c_name) AS lname,
             substring(c_name, 10, 9) AS id_part,
             CAST(length(c_name) AS INTEGER) AS name_len,
             lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
             regexp_replace(c_name, '0+', '0', 'g') AS squeezed
      FROM customer
      WHERE c_custkey < 200
      ORDER BY c_custkey
    """))

  /** Date/time scalar coverage: year/month/day, date_add, datediff,
    * date_trunc-to-month. [X2] Spark ints vs DuckDB BIGINT → cast oracle.
    */
  val q16 = GraftQuery(
    "q16_scalar_datetime",
    (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_add(col("o_orderdate").cast("date"), 30).cast("timestamp")
            .as("due_date"),
          datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).as("age_days"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INTEGER) AS y,
             CAST(month(o_orderdate) AS INTEGER) AS m,
             CAST(day(o_orderdate) AS INTEGER) AS dom,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
             CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INTEGER) AS age_days,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
      FROM orders
      WHERE o_orderkey < 500
      ORDER BY o_orderkey
    """))

  /** Math scalar coverage: abs/round/floor/ceil/mod/pow/sqrt. [X2]
    * All on positive values so HALF_UP (Spark) == HALF_AWAY (DuckDB).
    */
  val q17 = GraftQuery(
    "q17_scalar_math",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") < 300)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          abs(col("l_discount") - lit(0.05)).as("disc_dev"),
          round(col("l_extendedprice"), 1).as("price_r1"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          pmod(col("l_orderkey"), lit(7L)).as("key_mod"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          sqrt(col("l_quantity")).as("qty_sqrt"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS disc_dev,
             round(l_extendedprice, 1) AS price_r1,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             l_orderkey % 7 AS key_mod,
             pow(l_quantity, 2) AS qty_sq,
             sqrt(l_quantity) AS qty_sqrt
      FROM lineitem
      WHERE l_orderkey < 300
      ORDER BY l_orderkey, l_linenumber
    """))

  /** Array/generator coverage: split → explode → word count → top-20.
    * [X2/X4] Word ties broken by word text for a stable top-20.
    */
  val q18 = GraftQuery(
    "q18_word_counts",
    (s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20),
    Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 20
    """))

  /** Semi-structured extraction: pull int field k out of the JSON props
    * string (regex on both engines — no JSON-extension dependency), then
    * bucket and aggregate. [X2]
    */
  val q19 = GraftQuery(
    "q19_json_extract",
    (s, d) =>
      t(s, d, "events")
        .select(col("event_id"), col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1)
            .cast("int").as("k"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("k_bucket")),
    Some("""
      SELECT event_type, k % 10 AS k_bucket, COUNT(*) AS n
      FROM (SELECT event_type,
                   CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
            FROM events)
      GROUP BY 1, 2
      ORDER BY event_type, k_bucket
    """))

  /** Range (non-equi) join: pairs of events by the same user within 10
    * minutes. [X10]
    *
    * Scale design: a plain (user_id, range) join degenerates to all-pairs
    * per user (sort-merge join + residual filter — quadratic in events per
    * user). Instead, band the time axis into 10-minute buckets, replicate
    * the left side into buckets {b, b+1} (which provably cover every
    * in-range partner), and equi-join on (user_id, bucket) with the exact
    * range as a residual predicate — the standard banded interval-join
    * rewrite; pairs examined drop from O(n²/user) to O(n × bucket
    * occupancy).
    */
  val q20 = GraftQuery(
    "q20_range_join",
    (s, d) => {
      val e1 = t(s, d, "events").select(
        col("user_id").as("u"), col("event_id").as("id1"),
        col("ts").as("ts1"), col("event_type").as("type1"))
        .withColumn("b0", expr("unix_timestamp(ts1) div 600"))
        .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
        .drop("b0")
      val e2 = t(s, d, "events").select(
        col("user_id").as("u2"), col("event_id").as("id2"),
        col("ts").as("ts2"))
        .withColumn("bucket2", expr("unix_timestamp(ts2) div 600"))
      e1.join(e2,
          col("u") === col("u2") && col("bucket") === col("bucket2") &&
            col("id1") < col("id2") &&
            col("ts2") >= col("ts1") &&
            col("ts2") <= col("ts1") + expr("INTERVAL 10 MINUTES"))
        .groupBy(col("type1"))
        .agg(count(lit(1)).as("n_followers"))
        .orderBy(col("type1"))
    },
    Some("""
      SELECT e1.event_type AS type1, COUNT(*) AS n_followers
      FROM events e1 JOIN events e2
        ON e1.user_id = e2.user_id
       AND e1.event_id < e2.event_id
       AND e2.ts >= e1.ts
       AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
      GROUP BY 1
      ORDER BY type1
    """))

  val all: Seq[GraftQuery] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20)
}
