package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[StreamingSample]] (X69): the streamed bottom-k reservoir must equal
  * the batch window mirror on the same rows, for ANY batch slicing and
  * arrival order — the mergeability that makes a deterministic
  * reservoir possible where a classic RNG reservoir is unreplayable.
  */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSample._

  private val k = 4

  private def finalState(name: String): Map[String, Seq[Long]] =
    spark.table(name).as[Reservoir].collect()
      // Update mode emits once per (batch, stratum); the LAST emission
      // per stratum is the final state — dedup by keeping the largest
      // sample then latest content via groupBy over all rows
      .groupBy(_.stratum).view
      .mapValues(_.last.ids).toMap

  test("streamed reservoir equals the batch mirror under shuffled slicing") {
    val docs = (1L to 60L).map(id =>
      DocArrival(s"s${(id % 3).toInt}", id))
    val batchExpected = bottomKBatch(
      docs.toDF("stratum", "doc_id"), "stratum", "doc_id", k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    // adversarial slicing: reversed order, uneven batches, a duplicate
    val shuffled = docs.reverse
    val (b1, rest) = shuffled.splitAt(7)
    val (b2, b3) = rest.splitAt(29)
    val input = MemoryStream[DocArrival](spark)
    val q = bottomKStream(input.toDS(), k)
      .writeStream.outputMode("update")
      .format("memory").queryName("reservoir")
      .start()
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2 :+ b2.head: _*); q.processAllAvailable() // replayed row
    input.addData(b3: _*); q.processAllAvailable()
    q.stop()

    val streamed = finalState("reservoir")
    assert(streamed.keySet === batchExpected.keySet)
    streamed.foreach { case (stratum, ids) =>
      assert(ids === batchExpected(stratum),
        s"stratum $stratum: streamed $ids != batch ${batchExpected(stratum)}")
    }
  }

  test("state is bounded at k per stratum regardless of stream length") {
    val input = MemoryStream[DocArrival](spark)
    val q = bottomKStream(input.toDS(), k)
      .writeStream.outputMode("update")
      .format("memory").queryName("bounded")
      .start()
    (1 to 5).foreach { wave =>
      input.addData((1L to 100L).map(i =>
        DocArrival("s0", wave * 1000L + i)): _*)
      q.processAllAvailable()
    }
    q.stop()
    val last = spark.table("bounded").as[Reservoir].collect().last
    assert(last.ids.size === k)
    // and it IS the global bottom-k of everything that arrived
    val all = (1 to 5).flatMap(w => (1L to 100L).map(w * 1000L + _))
    val expect = all.sortBy(id => (sampleHash(id), id)).take(k)
    assert(last.ids === expect)
  }

  test("batch mirror on the real corpus: per-source rank, deterministic") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = bottomKBatch(docs, "source", "doc_id", k).collect().toSeq
    val b = bottomKBatch(docs.repartition(17), "source", "doc_id", k)
      .collect().toSeq
    assert(a === b, "sample must be partition-invariant")
    assert(a.groupBy(_.getString(0)).forall(_._2.size <= k))
  }
}
