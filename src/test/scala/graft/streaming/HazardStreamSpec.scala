package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[HazardStream]] (X201) oracles: CHRONOLOGICAL slicing of the
  * sf0.001 order feed reproduces batch q236 bit-for-bit (censoring
  * derived from the maintained frontier, never stored), an interval
  * SPLIT across batches closes once, a replayed batch id is a no-op,
  * and the state survives a REAL kill between state swap and
  * checkpoint commit over X71.
  */
class HazardStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("chronological 3-batch slicing == batch q236 bit-for-bit") {
    val path = tmpDir("hzstream") + "/state"
    val ordered = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey").cast("long"), col("o_orderkey"),
        col("o_orderdate"))
      .orderBy(col("o_orderdate"), col("o_orderkey")).collect()
    val n = ordered.length
    (0 until 3).foreach { i =>
      val slice = ordered.slice(i * n / 3, (i + 1) * n / 3)
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
        .toSeq.toDF("o_custkey", "o_orderkey", "o_orderdate")
      HazardStream.applyOnce(slice, path, i.toLong)
    }
    assert(rows(HazardStream.read(spark, path)) ===
      rows(graft.operators.HazardTable.q236.build(spark, sf0001)))
  }

  test("an interval split across batches closes exactly once; " +
      "replay is a no-op") {
    val path = tmpDir("hzstream-x") + "/state"
    def day(d: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        d.toLong * 86400000L)
    def mk(rs: Seq[(Long, Int)]) = rs.zipWithIndex.map {
      case ((c, d), i) => (c, (d * 100 + i).toLong, day(d))
    }.toDF("o_custkey", "o_orderkey", "o_orderdate")
    // batch 0: customer 1 orders day 0; customer 2 orders day 0
    HazardStream.applyOnce(mk(Seq((1L, 0), (2L, 0))), path, 0L)
    // batch 1: customer 1 again at day 9 -> the 9-day (week 1)
    // interval closes across the batch boundary via the frontier
    HazardStream.applyOnce(mk(Seq((1L, 9))), path, 1L)
    val out = rows(HazardStream.read(spark, path))
    // horizon = day 9: cust1 censored week 0, cust2 censored week 1,
    // one event at week 1
    assert(out === Seq(
      Seq(0L, 3L, 0L, 1L, 0.0),
      Seq(1L, 2L, 1L, 1L, 0.5)))
    HazardStream.applyOnce(mk(Seq((1L, 50))), path, 1L)
    assert(rows(HazardStream.read(spark, path)) === out,
      "replayed batch id must be a no-op")
  }

  test("life table survives a REAL kill between state swap and " +
      "checkpoint commit (X71 source)") {
    val path = tmpDir("hzstream-ks") + "/state"
    val ckpt = tmpDir("hzstream-ks-ckpt")
    EmbeddedLog.createTopic("hzks", 1)
    // 5 customers, orders every (cust+2) days — chronological feed
    val rs = (0 until 30).map { i =>
      val cust = i % 5
      (cust.toLong, i.toLong, (i / 5) * (cust + 2))
    }.sortBy(_._3)
    rs.zipWithIndex.foreach { case ((c, k, d), i) =>
      EmbeddedLog.sendString("hzks", "o",
        s"""{"cust":$c,"key":$k,"epd":${19723 + d}}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "hzks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "11")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'cust BIGINT, key BIGINT, epd BIGINT') AS j")
        .selectExpr("j.cust AS o_custkey", "j.key AS o_orderkey",
          "CAST(timestamp_seconds(j.epd * 86400) AS TIMESTAMP) " +
            "AS o_orderdate")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          HazardStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("hzstream-ks-ref") + "/state"
    HazardStream.applyOnce(
      rs.map { case (c, k, d) =>
        (c, k, new java.sql.Timestamp(
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
            d.toLong * 86400000L))
      }.toDF("o_custkey", "o_orderkey", "o_orderdate"),
      refPath, 0L)
    assert(rows(HazardStream.read(spark, path)) ===
      rows(HazardStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("hzks")
  }
}
