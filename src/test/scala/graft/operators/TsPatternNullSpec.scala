package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q97 oracle-divergence closure (r6 verdict item 3): the Spark path
  * filters `dist2 IS NOT NULL` (ANY null lag in the 8-window drops the
  * anchor) and the oracle must filter the COMPUTED distance the same
  * way — filtering only `v0` would keep mid-window-null anchors with a
  * NULL score. Proven here on a null-injected events fixture: the
  * DataFrame path and the oracle SQL (executed by Spark SQL, whose
  * LAG/window/null-arithmetic semantics match DuckDB's for this ANSI
  * subset) must return identical rows, and the nulls must actually
  * bite (injected rows exist, and anchors are dropped relative to a
  * v0-only filter).
  */
class TsPatternNullSpec extends SparkSpec {

  test("q97 DataFrame path matches its oracle SQL on null-injected values") {
    val dir = tmpDir("q97null")
    val events = graft.sources.Tables.events(spark, sf0001)
      .withColumn("value",
        when(col("event_id") % 37 === 0, lit(null)).otherwise(col("value")))
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val injected = graft.sources.Tables.events(spark, dir)
      .filter(col("value").isNull).count()
    assert(injected > 0, "fixture must actually contain null values")

    val sparkRows = SessionQueries.q97.build(spark, dir).collect().toSeq

    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events")
    try {
      val oracleRows = spark.sql(SessionQueries.q97.oracle.get).collect().toSeq
      assert(sparkRows.nonEmpty)
      assert(sparkRows === oracleRows,
        s"oracle semantics diverge under null values:\n spark=$sparkRows\n oracle=$oracleRows")

      // the divergence the old oracle had: v0-only filtering keeps
      // mid-window-null anchors (as NULL-scored rows). Assert such
      // anchors exist in the fixture, so this test genuinely
      // discriminates the two filters.
      val pattern = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val lags = pattern.indices.map(i =>
        lag(col("value"), pattern.size - 1 - i).over(w))
      val dist = lags.zip(pattern)
        .map { case (v, p) => (v - p) * (v - p) }.reduceLeft(_ + _)
      val midWindowNulls = graft.sources.Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("v0", lags.head).withColumn("dist2", dist)
        .filter(col("v0").isNotNull && col("dist2").isNull)
        .count()
      assert(midWindowNulls > 0,
        "fixture produced no mid-window-null anchors; weaken the modulus")
    } finally spark.catalog.dropTempView("events")
  }
}
