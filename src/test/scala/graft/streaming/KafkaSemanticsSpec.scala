package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** S1/S8/S28 executed END-TO-END in-sandbox over [[EmbeddedLog]] +
  * [[EmbeddedLogProvider]] — the r9 Derby recipe applied to the source
  * side (no kafka jars exist on any classpath here, so the broker
  * itself cannot run; this drives every Kafka SEMANTIC the reference
  * pipelines use through Spark's real MicroBatchStream machinery):
  *
  *  - producer → topic → readStream → foreachBatch → embedded-Derby
  *    JDBC, the full `producer.py` → `spark_kafka_consumer_dag.py`
  *    chain shape,
  *  - `maxRecordsPerTrigger` admission control (S28's rate cap),
  *    asserted per micro-batch,
  *  - checkpointed recovery: mid-run kill, more production, restart
  *    from the SAME checkpoint — no loss, no duplicates in the sink
  *    (offset-resume + idempotent upsert = effective exactly-once),
  *  - keyed partitioning affinity and within-partition offset order,
  *  - startingOffsets=latest vs earliest.
  */
class KafkaSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def fmt = classOf[EmbeddedLogProvider].getName

  private def read(topic: String, cap: Option[Long] = None,
      starting: String = "earliest"): DataFrame = {
    val r = spark.readStream.format(fmt)
      .option("topic", topic)
      .option("startingOffsets", starting)
    cap.foreach(c => r.option("maxRecordsPerTrigger", c.toString))
    r.load()
  }

  test("topic admin over the embedded log is idempotent") {
    assert(TopicAdmin.ensureTopic(EmbeddedLog.admin, "adm", 3) ===
      TopicAdmin.Created)
    assert(TopicAdmin.ensureTopic(EmbeddedLog.admin, "adm", 3) ===
      TopicAdmin.AlreadyExists)
    EmbeddedLog.dropTopic("adm")
  }

  test("keyed sends have stable partition affinity; null keys round-robin") {
    EmbeddedLog.createTopic("aff", 4)
    val pByKey = (0 until 50).map { i =>
      val k = s"key-${i % 7}"
      k -> EmbeddedLog.sendString("aff", k, s"v$i", 1000L + i)._1
    }
    // every send of the same key landed in one partition
    pByKey.groupBy(_._1).foreach { case (k, ps) =>
      assert(ps.map(_._2).distinct.size === 1, s"key $k hopped partitions")
    }
    val rrParts = (0 until 8).map(i =>
      EmbeddedLog.sendString("aff", null, s"n$i", 2000L + i)._1)
    assert(rrParts.distinct.size === 4, "null keys should spread")
    EmbeddedLog.dropTopic("aff")
  }

  test("rate cap: no micro-batch admits more than maxRecordsPerTrigger") {
    EmbeddedLog.createTopic("cap", 3)
    (0 until 300).foreach(i =>
      EmbeddedLog.sendString("cap", s"k$i", s"""{"i":$i}""", 1000L + i))
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.Set.empty[(Int, Long)]
    val q = read("cap", cap = Some(50L))
      .writeStream
      .option("checkpointLocation", tmpDir("cap-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.select(col("partition"), col("offset")).collect()
        batchSizes += rows.length.toLong
        rows.foreach(r => seen += ((r.getInt(0), r.getLong(1))))
        ()
      }
      .start()
    q.awaitTermination(300000)
    assert(batchSizes.forall(_ <= 50L),
      s"a batch exceeded the cap: $batchSizes")
    assert(batchSizes.sum === 300L)
    assert(seen.size === 300, "every (partition, offset) exactly once")
    // 300 records / 50 cap → at least 6 admitted batches
    assert(batchSizes.count(_ > 0) >= 6)
    EmbeddedLog.dropTopic("cap")
  }

  test("kafka-schema contract: AbsaPipeline.parse runs unchanged on the stream") {
    EmbeddedLog.createTopic("parse", 2)
    (0 until 20).foreach(i => EmbeddedLog.sendString("parse", s"$i",
      s"""{"id": "$i", "review": "tuyet voi so $i"}""", 5000L + i))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = AbsaPipeline.parse(read("parse"))
      .writeStream
      .option("checkpointLocation", tmpDir("parse-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        out ++= b.as[(String, String)].collect(); ()
      }
      .start()
    q.awaitTermination(300000)
    assert(out.map(_._1.toInt).sorted === (0 until 20))
    assert(out.forall { case (id, review) => review.endsWith(s"so $id") })
    EmbeddedLog.dropTopic("parse")
  }

  test("startingOffsets=latest skips the backlog") {
    EmbeddedLog.createTopic("late", 2)
    (0 until 10).foreach(i =>
      EmbeddedLog.sendString("late", s"$i", s"old$i", 1000L))
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val stream = read("late", starting = "latest")
      .writeStream
      .option("checkpointLocation", tmpDir("late-ckpt"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= b.select(col("value").cast("string")).as[String].collect()
        ()
      }
      .start()
    stream.processAllAvailable()
    assert(got.isEmpty, "latest must not read the backlog")
    (10 until 15).foreach(i =>
      EmbeddedLog.sendString("late", s"$i", s"new$i", 2000L))
    stream.processAllAvailable()
    stream.stop()
    assert(got.sorted === (10 until 15).map(i => s"new$i"))
    EmbeddedLog.dropTopic("late")
  }

  test("end-to-end: producer → topic → stream → Derby JDBC with mid-run " +
      "kill+restart is lossless and duplicate-free") {
    val url = s"jdbc:derby:${tmpDir("derby-kafka")}/db;create=true"
    val ckpt = tmpDir("e2e-ckpt")
    EmbeddedLog.createTopic("e2e", 3)

    // producer side through the S8 keyed sink (driver batch → topic)
    val firstWave = (0 until 120)
      .map(i => (i.toLong, s"""{"n":$i}""")).toDF("id", "payload")
    EmbeddedLog.producerSink("e2e", "id")(firstWave, 0L)

    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      read("e2e", cap = Some(40L))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          // key = (partition, offset): THE at-least-once dedup key for
          // a log consumer; replays after the kill collapse on it
          AbsaPipeline.idempotentJdbcAppend(
            b.selectExpr(
              "partition * 1000000 + offset AS po",
              "CAST(value AS STRING) AS v"),
            url, "landed", "po")
        }
        .start()

    val q1 = run()
    q1.processAllAvailable()
    q1.stop() // mid-run kill: offsets for wave 1 are committed
    EmbeddedLog.producerSink("e2e", "id")(
      (120 until 200).map(i => (i.toLong, s"""{"n":$i}"""))
        .toDF("id", "payload"), 1L)
    val q2 = run() // restart from the SAME checkpoint
    q2.processAllAvailable()
    q2.stop()

    val landed = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "landed").load()
      .selectExpr("CAST(po AS BIGINT)",
        "CAST(get_json_object(v, '$.id') AS INT)")
      .as[(Long, Int)].collect()
    assert(landed.length === 200, "no loss, no duplicates")
    assert(landed.map(_._1).distinct.length === 200)
    // payload integrity: every produced id arrived exactly once
    assert(landed.map(_._2).sorted === (0 until 200))
    // within-partition offsets are dense from 0 (order preserved)
    landed.map(_._1).groupBy(_ / 1000000).foreach { case (p, pos) =>
      assert(pos.map(_ % 1000000).sorted === (0L until pos.length),
        s"partition $p offsets not dense")
    }
    EmbeddedLog.dropTopic("e2e")
  }
}
