package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[FdAuditStream]] (X174) oracles: ARBITRARY (round-robin) slicing
  * of all three audited tables reproduces the batch q208 verdict
  * frame bit-for-bit (pair counts commute — the strong X98/X158/X165
  * contract), an FD that breaks only ACROSS batches is caught (each
  * batch alone satisfies it), a replayed batch id is a no-op, and the
  * maintained state survives a REAL kill between state swap and
  * checkpoint commit over the X71 source.
  */
class FdAuditStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("round-robin 3-batch slicing of orders/part/lineitem == batch " +
      "q208 bit-for-bit") {
    val base = tmpDir("fdstream")
    val tables = Seq(
      ("orders", "o_orderkey"), ("part", "p_partkey"),
      ("lineitem", "l_orderkey"))
    val paths = tables.map { case (t, key) =>
      val path = s"$base/$t"
      val df = spark.read.parquet(s"$sf0001/$t.parquet")
      (0 until 3).foreach { i =>
        FdAuditStream.applyOnce(t,
          df.filter(pmod(col(key), lit(3)) === i), path, i.toLong)
      }
      path
    }
    assert(rows(FdAuditStream.read(spark, paths)) ===
      rows(graft.operators.FdAudit.q208.build(spark, sf0001)))
  }

  test("an FD broken only ACROSS batches is caught: each batch is " +
      "single-valued per LHS, the union is not; replay is a no-op") {
    val path = tmpDir("fdstream-x") + "/orders"
    def batch(rs: Seq[(Long, String)]) = rs
      .map { case (c, p) => (c, p) }
      .toDF("o_custkey", "o_orderpriority")
    FdAuditStream.applyOnce("orders",
      batch(Seq(1L -> "HIGH", 2L -> "LOW")), path, 0L)
    FdAuditStream.applyOnce("orders",
      batch(Seq(1L -> "URGENT", 2L -> "LOW")), path, 1L)
    val r = FdAuditStream.read(spark, Seq(path)).collect()
      .find(_.getAs[String]("fd") == "cust_to_priority").get
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("n_violating_lhs") === 1L,
      "cross-batch two-priority customer must violate")
    assert(r.getAs[Long]("g3_rows") === 1L)
    assert(!r.getAs[Boolean]("holds"))
    // replayed batch id: no double count
    FdAuditStream.applyOnce("orders",
      batch(Seq(9L -> "LOW")), path, 1L)
    val r2 = FdAuditStream.read(spark, Seq(path)).collect()
      .find(_.getAs[String]("fd") == "cust_to_priority").get
    assert(r2.getAs[Long]("n_rows") === 4L, "replay double-counted")
  }

  test("maintained audit survives a REAL kill between state swap and " +
      "checkpoint commit (X71 source)") {
    val path = tmpDir("fdstream-ks") + "/orders"
    val ckpt = tmpDir("fdstream-ks-ckpt")
    EmbeddedLog.createTopic("fdks", 2)
    val rs = (0 until 30).map { i =>
      (i.toLong % 7, if (i % 11 == 0) "URGENT" else "LOW")
    }
    rs.zipWithIndex.foreach { case ((c, p), i) =>
      EmbeddedLog.sendString("fdks", "o",
        s"""{"o_custkey":$c,"o_orderpriority":"$p"}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[EmbeddedLogProvider].getName)
        .option("topic", "fdks").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "12")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'o_custkey BIGINT, o_orderpriority STRING') AS j")
        .selectExpr("j.o_custkey AS o_custkey",
          "j.o_orderpriority AS o_orderpriority")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          FdAuditStream.applyOnce("orders", b, path, id)
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    val refPath = tmpDir("fdstream-ks-ref") + "/orders"
    FdAuditStream.applyOnce("orders",
      rs.toDF("o_custkey", "o_orderpriority"), refPath, 0L)
    assert(rows(FdAuditStream.read(spark, Seq(path))) ===
      rows(FdAuditStream.read(spark, Seq(refPath))))
    EmbeddedLog.dropTopic("fdks")
  }
}
