package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MantelHaenszelStream]] (X238) oracles: ARBITRARY order slicing
  * reproduces batch q261 bit-for-bit (cells commute — the strong
  * maintenance contract), replay is a no-op, and the cells survive a
  * REAL kill between state swap and checkpoint commit over X71.
  */
class MantelHaenszelStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  private def ordersDf(rows: Seq[(Long, Double, String, Int)])
      : DataFrame =
    rows.map { case (k, price, st, m) =>
      (k, 1L, st, price, new Timestamp(Timestamp.valueOf(
        f"2024-$m%02d-15 00:00:00").getTime), "3-MEDIUM")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  // two months of mixed cells
  private val ledger: Seq[(Long, Double, String, Int)] =
    (0 until 40).map { i =>
      val m = i % 2 + 1
      val price = if (i % 3 == 0) 200000.0 else 100000.0
      val st = if ((i / 2) % 2 == 0) "F" else "O"
      (i.toLong, price, st, m)
    }

  test("arbitrary (orderkey mod 3) slicing == batch q261 bit-for-bit") {
    val path = tmpDir("mhstream") + "/state"
    val dir = tmpDir("mhbatch")
    ordersDf(ledger).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    (0 until 3).foreach { i =>
      MantelHaenszelStream.applyOnce(
        ordersDf(ledger.filter(_._1 % 3 == i)), path, i.toLong)
    }
    assert(rows(MantelHaenszelStream.read(spark, path)) ===
      rows(graft.operators.MantelHaenszel.q261.build(spark, dir)))
  }

  test("replayed batch id is a no-op") {
    val path = tmpDir("mhstream-x") + "/state"
    MantelHaenszelStream.applyOnce(ordersDf(ledger.take(10)), path, 0L)
    val before = rows(MantelHaenszelStream.read(spark, path))
    MantelHaenszelStream.applyOnce(ordersDf(ledger.drop(10)), path, 0L)
    assert(rows(MantelHaenszelStream.read(spark, path)) === before,
      "replay must not add cells")
  }

  test("cells survive a REAL kill between state swap and checkpoint " +
      "commit (X71 source)") {
    val path = tmpDir("mhstream-ks") + "/state"
    val ckpt = tmpDir("mhstream-ks-ckpt")
    EmbeddedLog.createTopic("mhks", 1)
    ledger.foreach { case (k, price, st, m) =>
      EmbeddedLog.sendString("mhks", "o",
        s"""{"k":$k,"p":$price,"s":"$st","m":$m}""", 1000L + k)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "mhks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "15")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'k BIGINT, p DOUBLE, s STRING, m INT') AS j")
        .selectExpr("j.k AS o_orderkey", "CAST(1 AS BIGINT) AS o_custkey",
          "j.s AS o_orderstatus", "j.p AS o_totalprice",
          "make_timestamp(2024, j.m, 15, 0, 0, 0) AS o_orderdate",
          "'3-MEDIUM' AS o_orderpriority")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          MantelHaenszelStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("mhstream-ks-ref") + "/state"
    MantelHaenszelStream.applyOnce(ordersDf(ledger), refPath, 0L)
    assert(rows(MantelHaenszelStream.read(spark, path)) ===
      rows(MantelHaenszelStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("mhks")
  }
}
