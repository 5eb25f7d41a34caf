package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[RichnessStream]] (X224) oracles: ARBITRARY document slicing
  * reproduces batch q253 bit-for-bit (counts commute — the strong
  * maintenance contract), replay is a no-op, and the counts survive a
  * REAL kill between state swap and checkpoint commit over X71.
  */
class RichnessStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("arbitrary (doc_id mod 3) slicing == batch q253 bit-for-bit") {
    val path = tmpDir("richstream") + "/state"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    (0 until 3).foreach { i =>
      RichnessStream.applyOnce(
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .select(col("source"), col("text")), path, i.toLong)
    }
    assert(rows(RichnessStream.read(spark, path)) ===
      rows(graft.operators.Chao1Richness.q253.build(spark, sf0001)))
  }

  test("replayed batch id is a no-op") {
    val path = tmpDir("richstream-x") + "/state"
    RichnessStream.applyOnce(
      Seq(("s0", "a a b")).toDF("source", "text"), path, 0L)
    val before = rows(RichnessStream.read(spark, path))
    RichnessStream.applyOnce(
      Seq(("s0", "c c c c")).toDF("source", "text"), path, 0L)
    assert(rows(RichnessStream.read(spark, path)) === before,
      "replay must not add tokens")
    assert(before === List(List("s0", 3L, 2L, 1L, 1L, 2.0d, 0.666667d)))
  }

  test("counts survive a REAL kill between state swap and checkpoint " +
      "commit (X71 source)") {
    val path = tmpDir("richstream-ks") + "/state"
    val ckpt = tmpDir("richstream-ks-ckpt")
    EmbeddedLog.createTopic("richks", 1)
    val texts = (0 until 30).map(i =>
      (i, s"w${i % 7} w${i % 3} common"))
    texts.foreach { case (i, t) =>
      EmbeddedLog.sendString("richks", "d",
        s"""{"src":"s${i % 2}","body":"$t"}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "richks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "10")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'src STRING, body STRING') AS j")
        .selectExpr("j.src AS source", "j.body AS text")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          RichnessStream.applyOnce(b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("richstream-ks-ref") + "/state"
    RichnessStream.applyOnce(
      texts.map { case (i, t) => (s"s${i % 2}", t) }
        .toDF("source", "text"), refPath, 0L)
    assert(rows(RichnessStream.read(spark, path)) ===
      rows(RichnessStream.read(spark, refPath)))
    EmbeddedLog.dropTopic("richks")
  }
}
