package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway A/B harness for q97's dist2 null filter (r7 VERDICT item 3:
  * q97 moved +64 % r6→r7, the only beyond-noise-band per-query move, and
  * the correctness-motivated `dist2.isNotNull` filter added that round is
  * the plausible cause). Runs the query min-of-3 WITH and WITHOUT the
  * filter, interleaved so host drift hits both arms equally.
  */
object ProfileQ97 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val events = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .localCheckpoint() // isolate the A/B from scan cost

    val pattern = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0)
    def query(withFilter: Boolean): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val lags = pattern.indices.map(i =>
        lag(col("value"), pattern.size - 1 - i).over(w))
      val dist = lags.zip(pattern)
        .map { case (v, p) => (v - p) * (v - p) }
        .reduceLeft(_ + _)
      val scored = events.withColumn("dist2", dist)
      val maybe = if (withFilter) scored.filter(col("dist2").isNotNull)
      else scored
      maybe.select(col("user_id"), col("event_id").as("anchor_event"),
        round(col("dist2"), 6).as("dist2_r"))
        .orderBy(col("dist2_r"), col("user_id"), col("anchor_event"))
        .limit(25)
    }

    def once(withFilter: Boolean): Double = {
      val t0 = System.nanoTime()
      query(withFilter).collect()
      (System.nanoTime() - t0) / 1e9
    }

    once(withFilter = true) // warmup (codegen + JIT)
    once(withFilter = false)
    val (as, bs) = (Array.ofDim[Double](3), Array.ofDim[Double](3))
    for (i <- 0 until 3) { as(i) = once(true); bs(i) = once(false) }
    println(f"[prof] q97 WITH null filter:    min=${as.min}%.3f s  runs=${as.map(x => f"$x%.3f").mkString(",")}")
    println(f"[prof] q97 WITHOUT null filter: min=${bs.min}%.3f s  runs=${bs.map(x => f"$x%.3f").mkString(",")}")
    println(f"[prof] filter cost = ${(as.min / bs.min - 1) * 100}%.1f %%")
    spark.stop()
  }
}
