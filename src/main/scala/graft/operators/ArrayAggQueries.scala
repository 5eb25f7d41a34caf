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

  val all: Seq[GraftQuery] = Seq(q37, q38, q39)
}
