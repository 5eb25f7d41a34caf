package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("replayed batch produces no duplicate keys (effective exactly-once)") {
    val sink = tmpDir("idem-sink") + "/out"
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val batch2 = Seq((2L, "b"), (3L, "c")).toDF("id", "v") // replays id=2

    AbsaPipeline.idempotentAppend(batch1, sink, "id")
    AbsaPipeline.idempotentAppend(batch2, sink, "id")
    // full replay of batch2 (crash-after-write, offsets uncommitted)
    AbsaPipeline.idempotentAppend(batch2, sink, "id")

    val rows = spark.read.parquet(sink)
    assert(rows.count() === 3)
    assert(rows.select("id").distinct().count() === 3)
  }

  test("at-least-once default keeps duplicates (faithful reference mode)") {
    val sink = tmpDir("alo-sink") + "/out"
    val batch = Seq((1L, "a")).toDF("id", "v")
    batch.write.mode("append").parquet(sink)
    batch.write.mode("append").parquet(sink)
    assert(spark.read.parquet(sink).count() === 2)
  }
}
