package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measurement harness for [[graft.plans.ApproxDistinctRule]] (r7 VERDICT
  * item 8): the opt-in optimizer rule that rewrites exact
  * `COUNT(DISTINCT x)` to HyperLogLog++ (rsd 2%). Runs the two
  * count-distinct query shapes the engine ships — q13's GLOBAL double
  * count-distinct over lineitem and q03's GROUPED count-distinct under a
  * join — min-of-3 with the rule off/on, interleaved so host drift hits
  * both arms equally, and reports the sketch's relative error so the
  * speed/accuracy trade is pinned by one run.
  *
  * Why these two shapes: an exact global distinct forces every key to one
  * aggregation (two full-width shuffles of the key column); grouped
  * distinct expands to a two-phase plan keyed on (group, value). HLL++
  * replaces both with constant-size partial sketches — the win should be
  * the shuffle-width delta, and should GROW with distinct-cardinality/SF.
  */
object ProfileApproxDistinct {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lineitem = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .localCheckpoint() // isolate the A/B from scan cost
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .localCheckpoint()
    val customer = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .localCheckpoint()

    // q13 shape: global aggregates with two exact count-distincts
    def globalQ: DataFrame = lineitem.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      sum(col("l_quantity")).as("sum_qty"))

    // q03 shape: grouped count-distinct under a join
    def groupedQ: DataFrame = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("o_totalprice")).as("revenue"))

    def run(q: => DataFrame, approx: Boolean): (Double, Array[Long]) = {
      spark.conf.set("spark.graft.approxDistinct.enabled", approx.toString)
      try {
        val t0 = System.nanoTime()
        val rows = q.collect()
        val secs = (System.nanoTime() - t0) / 1e9
        val counts = rows.flatMap(r => (0 until r.length).collect {
          case i if r.schema(i).name.startsWith("n_") => r.getLong(i)
        })
        (secs, counts)
      } finally spark.conf.set("spark.graft.approxDistinct.enabled", "false")
    }

    for ((name, q) <- Seq(("q13-global", () => globalQ),
        ("q03-grouped", () => groupedQ))) {
      run(q(), approx = false); run(q(), approx = true) // warmup both plans
      val (ex, ap) = (Array.ofDim[Double](3), Array.ofDim[Double](3))
      var exactCounts: Array[Long] = Array.empty
      var approxCounts: Array[Long] = Array.empty
      for (i <- 0 until 3) {
        val (te, ce) = run(q(), approx = false); ex(i) = te; exactCounts = ce
        val (ta, ca) = run(q(), approx = true); ap(i) = ta; approxCounts = ca
      }
      val maxErr = exactCounts.zip(approxCounts).map { case (e, a) =>
        math.abs(a - e).toDouble / math.max(e, 1L)
      }.max
      println(f"[prof] $name exact:  min=${ex.min}%.3f s  runs=${ex.map(x => f"$x%.3f").mkString(",")}")
      println(f"[prof] $name approx: min=${ap.min}%.3f s  runs=${ap.map(x => f"$x%.3f").mkString(",")}")
      println(f"[prof] $name speedup=${ex.min / ap.min}%.2fx  max_rel_err=${maxErr * 100}%.2f%% (rsd target 2%%)")
    }
    spark.stop()
  }
}
