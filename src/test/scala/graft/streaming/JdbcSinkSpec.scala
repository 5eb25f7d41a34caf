package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** S5 exercised for REAL: Spark ships embedded Derby on its own
  * classpath, so the `DataFrameWriter.jdbc` path, the streaming
  * foreachBatch→JDBC wiring, and the idempotent keyed upsert all run
  * against an actual SQL database — no parquet stand-in. (Postgres in
  * production differs only by URL/credentials; the Spark-side plan and
  * the upsert contract are identical.)
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def derbyUrl(name: String): String =
    s"jdbc:derby:${tmpDir(s"derby-$name")}/db;create=true"

  test("batch jdbc append + read-back round trip") {
    val url = derbyUrl("roundtrip")
    val df = Seq((1L, "pos", 0.9), (2L, "neg", 0.2), (3L, "neu", 0.5))
      .toDF("id", "label", "score")
    AbsaPipeline.jdbcAppend(df, url, "scores")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "scores").load()
    assert(back.count() === 3)
    assert(back.columns.map(_.toLowerCase).sorted ===
      Array("id", "label", "score"))
    val byId = back.select(col("id").cast("long"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId === Map(1L -> "pos", 2L -> "neg", 3L -> "neu"))
  }

  test("idempotent jdbc upsert: a replayed batch cannot duplicate keyed rows") {
    val url = derbyUrl("upsert")
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    AbsaPipeline.idempotentJdbcAppend(b1, url, "t", "id")
    // at-least-once replay: same batch again plus one new row
    val b2 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    AbsaPipeline.idempotentJdbcAppend(b2, url, "t", "id")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "t").load()
    assert(back.count() === 3, "replayed keys must be dropped, new kept")
    assert(back.select(col("ID")).as[Long].collect().sorted ===
      Array(1L, 2L, 3L))
  }

  test("streaming foreachBatch lands micro-batches in the JDBC table") {
    val url = derbyUrl("stream")
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("id", "v")
      .writeStream
      .option("checkpointLocation", tmpDir("derby-ckpt"))
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AbsaPipeline.idempotentJdbcAppend(batch, url, "events", "id")
      }
      .trigger(Trigger.AvailableNow())
    input.addData((10L, "x"), (11L, "y"))
    val h = q.start(); h.awaitTermination(60000)
    input.addData((11L, "y"), (12L, "z")) // overlap with batch 1
    val h2 = q.start(); h2.awaitTermination(60000)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "events").load()
    assert(back.select(col("ID")).as[Long].collect().sorted ===
      Array(10L, 11L, 12L))
  }
}
