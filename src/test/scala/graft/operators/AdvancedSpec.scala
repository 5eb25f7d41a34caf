package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CsvCorpusSource
import graft.streaming.AbsaPipeline

class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  test("q34 approx distinct within 5% of exact (banded form: exact " +
      "columns match q13, band booleans true)") {
    val row = AdvancedQueries.q34.build(spark, sf0001).first()
    val exact = RelationalQueries.q13.build(spark, sf0001)
      .select("n_orders", "n_parts").first()
    assert(row.getAs[Long]("exact_orders") === exact.getLong(0))
    assert(row.getAs[Long]("exact_parts") === exact.getLong(1))
    assert(row.getAs[Boolean]("orders_within_5pct"))
    assert(row.getAs[Boolean]("parts_within_5pct"))
  }

  test("q75 approx percentiles within rank tolerance of exact") {
    import org.apache.spark.sql.functions._
    // the banded query's own rank booleans must hold...
    SketchQueries.q75.build(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Boolean]("p50_rank_ok"), r.getString(0))
      assert(r.getAs[Boolean]("p95_rank_ok"), r.getString(0))
    }
    // ...and the raw GK VALUES stay near the exact interpolated
    // quantiles (value-wise band, recomputed here since the banded
    // query hashes ranks, not engine-specific sketch values)
    val approx = graft.sources.Tables(spark, sf0001, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.95), 10000)")
        .as("p"))
      .select(col("o_orderpriority"), col("p").getItem(0).as("p50"),
        col("p").getItem(1).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val exact = graft.sources.Tables(spark, sf0001, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (a50, a95)) =>
      val (e50, e95) = exact(k)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$k p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"$k p95: $a95 vs $e95")
    }
  }

  test("mode UDAF: deterministic tiebreak and partial-merge correctness") {
    val df = Seq("b", "a", "a", "b", "c").toDF("v").repartition(4)
    // a and b tie at 2 → lexically smallest wins
    assert(df.agg(graft.functions.ModeAggregator.modeOf(col("v")))
      .first().getString(0) === "a")
  }

  test("as-of join semantics: at-or-before, none-before yields null") {
    val events = Seq(
      // user 1: signup@10, error@5 (before any signup), error@15, signup@20, error@25
      (1L, 5L, "error"), (1L, 10L, "signup"), (1L, 15L, "error"),
      (1L, 20L, "signup"), (1L, 25L, "error"),
      // user 2: signup and error at the same ts → at-or-before matches it
      (2L, 30L, "signup"), (2L, 30L, "error"))
      .zipWithIndex
      .map { case ((u, t, ty), i) =>
        (i.toLong, new java.sql.Timestamp(t * 1000), u, ty, 0.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("asof")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AdvancedQueries.q32.build(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(0L) === -1L, "error before any signup → null")
    assert(got(2L) === 1L, "error@15 matches signup@10 (event_id 1)")
    assert(got(4L) === 3L, "error@25 matches signup@20 (event_id 3)")
    assert(got(6L) === 5L, "same-ts signup qualifies (at-or-before)")
  }

  test("CSV corpus source: declared schema, corrupt rows captured, label map") {
    val p = java.nio.file.Paths.get(tmpDir("csv"), "corpus.csv")
    java.nio.file.Files.writeString(p,
      """Review,Price,Shipping,Outlook,Quality,Size,Shop_Service,General,Others
        |"good shoes",1,-1,-1,2,-1,-1,2,-1
        |"bad,seam",0,0,-1,-1,-1,1,-1,-1
        |"broken row",9,not-an-int,,,,,,
        |""".stripMargin)
    val df = CsvCorpusSource.read(spark, p.toString).cache()
    assert(df.count() === 3)
    assert(df.filter(col("_corrupt").isNotNull).count() === 1)
    val mapped = CsvCorpusSource.withMappedLabels(
      df.filter(col("_corrupt").isNull))
    val r = mapped.filter(col("Review") === "good shoes").first()
    assert(r.getAs[Int]("Price_class") === 2) // 1 → 2
    assert(r.getAs[Int]("Shipping_class") === 0) // -1 → 0
    assert(r.getAs[Int]("Quality_class") === 3) // 2 → 3
  }

  test("stream-static enrichment join: frames enriched with camera dim") {
    val cameraDim = Seq(("CAM_0", "north"), ("CAM_1", "south"))
      .toDF("camera_id", "zone")
    val input = MemoryStream[String](spark)
    input.addData(
      """{"id": "1", "review": "x"}""") // reuse review shape as a stand-in
    val parsed = AbsaPipeline.parse(input.toDF())
      .withColumn("camera_id", lit("CAM_1"))
    val joined = parsed.join(broadcast(cameraDim), "camera_id")
    val q = joined.writeStream.format("memory").queryName("enriched").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched").select("id", "zone")
      .as[(String, String)].collect()
    assert(rows.toSeq === Seq(("1", "south")))
  }

  test("kafka value serializer round-trips through the parser") {
    val original = Seq(("7", "some review text")).toDF("id", "review")
    val roundTrip = AbsaPipeline.parse(
      AbsaPipeline.toKafkaValue(original))
    assert(roundTrip.as[(String, String)].collect().toSeq ===
      Seq(("7", "some review text")))
  }
}
