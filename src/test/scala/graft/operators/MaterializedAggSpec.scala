package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MaterializedAgg]] (X98) oracles: incremental merge ≡ one-shot
  * recompute under DIFFERENT batch slicings (exact columns equal, HLL
  * estimates equal — sketches are insertion-order-independent), the
  * HLL estimate stays within its rsd of the true distinct count, and
  * a crash mid-swap leaves the previous state readable.
  */
class MaterializedAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val ev = spark.read
    .parquet(s"$sf0001/events.parquet")
    .select(col("event_type").as("g"), col("value").as("v"),
      col("user_id").as("u"), col("event_id"))

  private def run(slices: Seq[org.apache.spark.sql.DataFrame]): String = {
    val path = tmpDir("matagg") + "/state"
    MaterializedAgg.init(slices.head, path)
    slices.tail.foreach(MaterializedAgg.merge(_, path))
    path
  }

  private def snapshot(path: String): Seq[(String, Long, Double,
      Double, Double, Double)] =
    MaterializedAgg.read(spark, path)
      .selectExpr("g", "n", "total", "mn", "mx", "approx_distinct")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq

  test("merge == one-shot recompute under two different batch " +
      "slicings, HLL estimates included") {
    val byMod = run((0 to 3).map(b => ev.filter(col("event_id") % 4 === b)))
    val byRange = run(Seq(
      ev.filter(col("event_id") < 100),
      ev.filter(col("event_id") >= 100 && col("event_id") < 150),
      ev.filter(col("event_id") >= 150)))
    val oneShot = run(Seq(ev))
    assert(snapshot(byMod) === snapshot(oneShot),
      "mod-4 slicing must replay to the one-shot state")
    assert(snapshot(byRange) === snapshot(oneShot),
      "range slicing must replay to the one-shot state")
  }

  test("HLL distinct estimate within 5% of truth per group") {
    val path = run((0 to 3).map(b => ev.filter(col("event_id") % 4 === b)))
    val truth = ev.groupBy(col("g"))
      .agg(countDistinct(col("u")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    snapshot(path).foreach { case (g, _, _, _, _, est) =>
      val t = truth(g).toDouble
      assert(math.abs(est - t) / t < 0.05,
        s"group $g: estimate $est vs true $t")
    }
  }

  test("streaming maintenance is exactly-once under replay: a " +
      "re-delivered batch id is skipped, the state never double-counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmpDir("matagg-stream") + "/state"
    val ckpt = tmpDir("matagg-ckpt")
    val input = MemoryStream[(String, Double, Long)](spark)
    def runAvailable(): Unit = {
      val q = MaterializedAgg.stream(
        input.toDF().toDF("g", "v", "u"), path, ckpt)
      q.awaitTermination(120000)
    }
    input.addData(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 5.0, 1L))
    runAvailable()
    input.addData(("a", 4.0, 3L))
    runAvailable()
    val after = snapshot(path)
    assert(MaterializedAgg.committedBatch(spark, path) === 1L)
    // simulate the at-least-once face: foreachBatch re-invoked with an
    // ALREADY-COMMITTED batch id (crash after state swap, before the
    // checkpoint commit) — must be a no-op
    MaterializedAgg.mergeOnce(
      Seq(("a", 4.0, 3L)).toDF("g", "v", "u"), path, batchId = 1L)
    assert(snapshot(path) === after, "replayed batch double-counted")
    val a = after.find(_._1 == "a").get
    assert(a._2 === 3L)      // 3 rows for g=a
    assert(a._3 === 7.0)     // 1+2+4
    // a genuinely NEW batch id still merges
    MaterializedAgg.mergeOnce(
      Seq(("b", 1.0, 9L)).toDF("g", "v", "u"), path, batchId = 2L)
    assert(snapshot(path).find(_._1 == "b").get._3 === 6.0)
  }

  test("a failed merge cannot corrupt the state (tmp-then-swap)") {
    val path = tmpDir("matagg-crash") + "/state"
    MaterializedAgg.init(ev.filter(col("event_id") % 2 === 0), path)
    val before = snapshot(path)
    // a delta with a wrong schema throws mid-merge — state must survive
    intercept[Exception] {
      MaterializedAgg.merge(
        Seq((1, 2)).toDF("bad", "schema"), path)
    }
    assert(snapshot(path) === before, "state changed after failed merge")
  }
}
