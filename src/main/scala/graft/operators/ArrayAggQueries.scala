package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** Unpivot, ordered array aggregation, and exact percentiles — the last
  * scalar/agg surface items.
  */
object ArrayAggQueries {

  /** Unpivot (wide → long) of the customer numeric columns. */
  val q37 = GraftQuery(
    "q37_unpivot",
    (s, d) =>
      t(s, d, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          col("c_acctbal").as("acctbal"),
          col("c_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("c_custkey")), Array(col("acctbal"),
          col("nationkey")), "metric", "value")
        .orderBy(col("c_custkey"), col("metric")),
    Some("""
      SELECT c_custkey, metric, value FROM (
        SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value
        FROM customer WHERE c_custkey < 100
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
        FROM customer WHERE c_custkey < 100)
      ORDER BY c_custkey, metric
    """))

  /** Ordered array aggregation: each user's first five event types in
    * event-time order, comma-joined (string output avoids array-equality
    * representation differences across engines).
    *
    * Memory bound: the events are pre-pruned to the 5 earliest per user
    * with the native TopKPerGroup operator BEFORE collect_list, so no agg
    * buffer ever holds more than 5 elements — a hot user with 10M events
    * contributes k rows, not a 10M-element array. The total count comes
    * from a separate hash agg; both aggs and the join hash-partition on
    * user_id, so the join adds no extra shuffle.
    */
  val q38 = GraftQuery(
    "q38_array_agg_ordered",
    (s, d) => {
      val ev = t(s, d, "events")
      val counts = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val firstFive = graft.plans.TopK
        .perGroup(ev, Seq(col("user_id")),
          Seq(col("ts").asc, col("event_id").asc), 5)
        .groupBy(col("user_id"))
        .agg(concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type"))).as("first_types"))
      firstFive.join(counts, "user_id")
        .select(col("user_id"), col("first_types"), col("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
             array_to_string((list(event_type ORDER BY ts, event_id))[:5], ',')
               AS first_types,
             COUNT(*) AS n_events
      FROM events
      GROUP BY 1
      ORDER BY user_id
    """))

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`): quartiles of order value per priority.
    */
  val q39 = GraftQuery(
    "q39_percentiles",
    (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, 0.25)").as("p25"),
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority")),
    Some("""
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS p25,
             quantile_cont(o_totalprice, 0.5) AS p50,
             quantile_cont(o_totalprice, 0.75) AS p75,
             COUNT(*) AS n
      FROM orders
      GROUP BY 1
      ORDER BY o_orderpriority
    """))

  /** Distributed second-moment statistics (stddev, correlation) computed
    * the hash-checkable way: EXACT decimal power sums (n, Σx, Σx², Σxy —
    * associative, partitioning-independent) rolled up first, then ONE
    * double-precision formula evaluation at the end. Spark's built-in
    * `stddev`/`corr` accumulate in doubles, so their low bits depend on
    * partition merge order — fine for dashboards, not for a
    * deterministic gate; the power-sum form costs the same shuffle
    * (six partial aggregates, map-side combined) and is exact.
    */
  val q74 = GraftQuery(
    "q74_moment_stats",
    (s, d) => {
      val qd = dec(col("l_quantity"))
      val pd = dec(col("l_extendedprice"))
      val n = col("n").cast("double")
      val stdQty =
        sqrt((n * col("sqq").cast("double") -
          col("sq").cast("double") * col("sq").cast("double")) /
          (n * (n - 1.0)))
      val corrNum = n * col("sqp").cast("double") -
        col("sq").cast("double") * col("sp").cast("double")
      val corrDen =
        sqrt(n * col("sqq").cast("double") -
          col("sq").cast("double") * col("sq").cast("double")) *
          sqrt(n * col("spp").cast("double") -
            col("sp").cast("double") * col("sp").cast("double"))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(qd).as("sq"), sum(pd).as("sp"),
          sum(qd * qd).as("sqq"), sum(pd * pd).as("spp"),
          sum(qd * pd).as("sqp"))
        .select(col("l_returnflag"), col("n"),
          round(stdQty, 4).as("std_qty"),
          round(corrNum / corrDen, 4).as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH sums AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
               SUM(CAST(l_quantity AS DECIMAL(18,2)) *
                   CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   CAST(l_extendedprice AS DECIMAL(18,2))) AS spp,
               SUM(CAST(l_quantity AS DECIMAL(18,2)) *
                   CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp
        FROM lineitem
        GROUP BY 1)
      SELECT l_returnflag, n,
             round(sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) -
                         CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) /
                        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 4)
               AS std_qty,
             round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) -
                    CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) /
                   (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) -
                         CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
                    sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) -
                         CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 4)
               AS corr_qty_price
      FROM sums
      ORDER BY l_returnflag
    """))

  val all: Seq[GraftQuery] = Seq(q37, q38, q39, q74)
}
