package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{HazardTable, MaterializedAgg}

/** X201 — streaming maintenance of the X200 discrete-hazard life
  * table: the repeat-purchase survival dashboard kept current per
  * order-feed batch. The fold is ORDER-DEPENDENT ([[MaterializedAgg
  * .foldOnceAs]], the X123/X140/X182 discipline): an interval closes
  * when its ENDING order arrives, so the contract is CHRONOLOGICAL
  * slicing (each batch's orders at-or-after the state's per-customer
  * frontier) ≡ batch q236 bit-for-bit — the order a CDC order feed
  * delivers naturally. Censoring is virtual: censored intervals are
  * NOT state (they would need retroactive reopening every time the
  * horizon advances); the state keeps each customer's LAST order day
  * plus the closed-event week counts, and read() derives the censor
  * column from the frontier frame against the current horizon — so a
  * customer whose next order arrives simply moves their frontier, and
  * the censored interval they "had" never existed as state.
  *
  * State: |customers| frontier rows + |weeks| counter rows in one
  * tagged frame — the minimal state ANY exact life table carries
  * (each closed interval must be counted, each open one must know its
  * start). Scale: the per-batch window touches the delta and its
  * matching frontier rows only; read() is two dimension-frame
  * groupBys + the shared [[HazardTable.lifeTable]] tail.
  */
object HazardStream {

  private def epochDay(c: org.apache.spark.sql.Column) =
    datediff(c, lit("1970-01-01").cast("date")).cast("long")

  /** One fold step: close intervals ending in the delta (seeded by
    * the state's per-customer frontier), merge counters + frontiers.
    */
  def step(state: Option[DataFrame], delta: DataFrame): DataFrame = {
    val base = delta.select(col("o_custkey").cast("long").as("cust"),
      col("o_orderkey"), epochDay(col("o_orderdate")).as("day"))
    val custState = state.map(_.filter(col("kind") === "c")
      .select(col("key").as("cust"), col("cnt").as("state_last")))
    val withState = custState match {
      case Some(cs) => base.join(cs, Seq("cust"), "left")
      case None => base.withColumn("state_last", lit(null).cast("long"))
    }
    val w = Window.partitionBy(col("cust"))
      .orderBy(col("day"), col("o_orderkey"))
    val events = withState
      .withColumn("prev", coalesce(lag(col("day"), 1).over(w),
        col("state_last")))
      .filter(col("prev").isNotNull)
      .select(expr("(day - prev) div 7").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .withColumn("kind", lit("w"))
    val frontiers = base.groupBy(col("cust").as("key"))
      .agg(max(col("day")).as("cnt"))
      .withColumn("kind", lit("c"))
    val delta2 = events.unionByName(frontiers)
      .select(col("kind"), col("key"), col("cnt"))
    state match {
      case None => delta2
      case Some(st) =>
        st.unionByName(delta2)
          .groupBy(col("kind"), col("key"))
          // 'w' rows accumulate (sum); 'c' rows advance (max) — one
          // conditional agg keeps the state a single frame
          .agg(when(col("kind") === "w", sum(col("cnt")))
            .otherwise(max(col("cnt"))).as("cnt"))
          .select(col("kind"), col("key"), col("cnt"))
    }
  }

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    MaterializedAgg.foldOnceAs(delta, path, batchId, step)

  /** The q236 life table from the maintained state: event weeks from
    * the counters, censor weeks derived from the frontier frame
    * against the current horizon (= max frontier, exactly batch
    * q236's max order date).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    val st = spark.read.parquet(path)
    val fronts = st.filter(col("kind") === "c")
    val horizon = fronts.agg(max(col("cnt")).as("h_end"))
    val censor = fronts.join(broadcast(horizon))
      .select(expr("(h_end - cnt) div 7").as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("c"))
      .select(col("week"), lit(0L).as("d_events"),
        col("c").as("c_censored"))
    val events = st.filter(col("kind") === "w")
      .select(col("key").as("week"), col("cnt").as("d_events"),
        lit(0L).as("c_censored"))
    HazardTable.lifeTable(
      events.unionByName(censor)
        .groupBy(col("week"))
        .agg(sum(col("d_events")).as("d_events"),
          sum(col("c_censored")).as("c_censored")))
  }
}
