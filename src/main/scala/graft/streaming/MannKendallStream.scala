package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MannKendall, MaterializedAgg}

/** X204 — streaming maintenance of the X202 Mann–Kendall trend test:
  * the monotone-drift monitor kept current per ingest batch. The
  * incremental trick making exact maintenance cheap: S needs every
  * PAIR of days, but a NEW day's contribution
  *   ΔS = #{past days with smaller x} − #{past days with larger x}
  * is a pure function of the per-type VALUE HISTOGRAM — so the state
  * is (type, value, count) counters plus one running-S row per type
  * (|types × distinct values| rows, not |days|², and never the raw
  * series), and the tie-corrected variance recomputes at read time
  * from the same histogram. Fold contract ([[MaterializedAgg
  * .foldOnceAs]], the X123/X140/X182/X201 discipline): DAY-COMPLETE
  * chronological batches (a day split across two batches would count
  * as two half-days — stated; the natural slicing of a daily roll-up
  * feed) reproduce batch q237 bit-for-bit.
  *
  * Scale: the per-batch work is one map-side daily groupBy, a
  * |batch days| × |state values| histogram join (value diversity
  * bounded — daily counts, not raw values), and the ≤|batch days|²
  * in-batch pair frame. read() is two dimension-frame groupBys plus
  * q237's fixed double tree.
  */
object MannKendallStream {

  private def dailyOf(delta: DataFrame): DataFrame =
    delta.groupBy(col("event_type").as("g"),
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
        .cast("long").as("day"))
      .agg(count(lit(1)).as("x"))

  /** One fold step: ΔS from the histogram + in-batch pairs, then a
    * uniform union-sum merge of counters (both row kinds accumulate
    * by SUM, so the merge is one groupBy).
    */
  def step(state: Option[DataFrame], delta: DataFrame): DataFrame = {
    val days = dailyOf(delta)
    val vDelta = days.groupBy(col("g"), col("x"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("g"), lit("v").as("kind"), col("x").as("key"),
        col("cnt"))
    val dsState = state match {
      case Some(st) => days
        .join(st.filter(col("kind") === "v")
          .select(col("g"), col("key").as("v"), col("cnt")), Seq("g"))
        .select(col("g"),
          when(col("x") > col("v"), col("cnt"))
            .when(col("x") < col("v"), -col("cnt"))
            .otherwise(0L).as("d"))
      case None => days.select(col("g"), lit(0L).as("d")).limit(0)
    }
    val dsBatch = days.as("a")
      .join(days.as("b"),
        col("a.g") === col("b.g") && col("a.day") < col("b.day"))
      .select(col("a.g").as("g"),
        when(col("b.x") > col("a.x"), 1L)
          .when(col("b.x") < col("a.x"), -1L)
          .otherwise(0L).as("d"))
    val sDelta = dsState.unionByName(dsBatch)
      .groupBy(col("g")).agg(sum(col("d")).as("cnt"))
      .select(col("g"), lit("s").as("kind"), lit(0L).as("key"),
        col("cnt"))
    // every type needs an s row even when the batch adds zero pairs
    val sSeed = days.select(col("g")).distinct()
      .select(col("g"), lit("s").as("kind"), lit(0L).as("key"),
        lit(0L).as("cnt"))
    val merged = state.map(_.unionByName(vDelta))
      .getOrElse(vDelta)
      .unionByName(sDelta).unionByName(sSeed)
    merged.groupBy(col("g"), col("kind"), col("key"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("g"), col("kind"), col("key"), col("cnt"))
  }

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    MaterializedAgg.foldOnceAs(delta, path, batchId, step)

  /** q237's output from the maintained state: n and the tie term
    * from the value histogram, S from the running row, the same
    * fixed double tree (column-for-column, bit-for-bit).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    val st = spark.read.parquet(path)
    val hist = st.filter(col("kind") === "v")
    val nF = hist.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    val ties = hist.groupBy(col("g"))
      .agg(sum(expr("cnt * (cnt - 1) * (2 * cnt + 5)")).as("tie_term"))
    val sF = st.filter(col("kind") === "s")
      .select(col("g"), col("cnt").as("s_stat"))
    nF.join(sF, Seq("g")).join(ties, Seq("g"))
      .filter(col("n") >= 2) // q237's inner pair join drops n=1 types
      .withColumn("var18",
        expr("n * (n - 1) * (2 * n + 5) - tie_term"))
      .withColumn("z", expr(
        "case when var18 > 0 then " +
          "case when s_stat > 0 then " +
          "(cast(s_stat as double) - 1.0) " +
          "/ sqrt(cast(var18 as double) / 18.0) " +
          "when s_stat < 0 then (cast(s_stat as double) + 1.0) " +
          "/ sqrt(cast(var18 as double) / 18.0) " +
          "else 0.0 end end"))
      .withColumn("trend_detected",
        when(col("var18") > 0, abs(col("z")) > MannKendall.Z975))
      .select(col("g"), col("n").as("n_days"), col("s_stat"),
        col("var18"), col("z"), col("trend_detected"))
      .orderBy(col("g"))
  }
}
