package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[IncrementalCc]] (X107) oracles: incremental closure over
  * ADVERSARIAL batch slicings (no batch ever sees a whole component)
  * must equal the one-shot closure, the state must be a minimal
  * star-forest certificate (|rows| = nodes − components), and replay
  * must be a no-op. q154's value correctness vs the recursive-CTE
  * oracle is the DuckDB hash check.
  */
class IncrementalCcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mergeSlices(pairs: Seq[(Long, Long)], slices: Int): String = {
    val path = tmpDir("icc") + "/state"
    pairs.zipWithIndex.groupBy(_._2 % slices).toSeq.sortBy(_._1)
      .foreach { case (b, chunk) =>
        IncrementalCc.mergeOnce(
          chunk.map(_._1).toDF("doc_a", "doc_b"), path, b.toLong)
      }
    path
  }

  private def labelsOf(path: String): Map[Long, Long] =
    IncrementalCc.readLabels(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a 64-node chain sliced so every batch holds every 3rd edge " +
      "(no batch connects anything locally) closes to ONE component " +
      "with the min-id root") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val path = mergeSlices(chain, 3)
    val got = labelsOf(path)
    assert(got.keySet === (0L to 63L).toSet)
    assert(got.values.toSet === Set(0L), "chain must close to root 0")
    // certificate minimality: 64 nodes, 1 component → 63 star edges
    assert(spark.read.parquet(path).count() === 63L)
  }

  test("incremental == one-shot on a mixed graph (cliques + chains + " +
      "isolated pairs) under two different slicings") {
    val clique = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (100 + i, 100 + j)
    val chain = (0L until 10L).map(i => (200 + i, 201 + i))
    val pairs = (clique ++ chain ++ Seq((300L, 301L), (302L, 303L))).toSeq
    val oneShot = labelsOf(mergeSlices(pairs, 1))
    assert(labelsOf(mergeSlices(pairs, 4)) === oneShot)
    assert(labelsOf(mergeSlices(pairs.reverse, 5)) === oneShot)
    // components and roots are the min ids
    assert(oneShot(104L) === 100L && oneShot(210L) === 200L &&
      oneShot(303L) === 302L)
  }

  test("a later batch BRIDGES two previously separate components and " +
      "the certificate shrinks to one star") {
    val path = tmpDir("icc-bridge") + "/state"
    IncrementalCc.mergeOnce(Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b"),
      path, 0L)
    assert(labelsOf(path) === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    IncrementalCc.mergeOnce(Seq((2L, 3L)).toDF("doc_a", "doc_b"), path, 1L)
    assert(labelsOf(path).values.toSet === Set(1L),
      "bridge must merge the components under the global min root")
    assert(spark.read.parquet(path).count() === 3L) // 4 nodes − 1 comp
  }

  test("X107 streaming form survives a REAL kill between state swap " +
      "and checkpoint commit (X71 source): restart replays the batch " +
      "id, mergeOnce skips it, read-back ≡ the one-shot q68-style " +
      "closure of the full mined pair set (the q154 oracle machinery)") {
    import graft.streaming.EmbeddedLog
    // the REAL pair set q154's oracle hash-checks: near-dup pairs
    // mined from the sf0.001 documents corpus
    val pairs = DedupQueries.jaccardPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length > 10, "the mined pair set must be non-trivial")
    val path = tmpDir("icc-ks") + "/state"
    val ckpt = tmpDir("icc-ks-ckpt")
    EmbeddedLog.createTopic("iccpairs", 2)
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      EmbeddedLog.sendString("iccpairs", a.toString,
        s"""{"doc_a":$a,"doc_b":$b}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[graft.streaming.EmbeddedLogProvider].getName)
        .option("topic", "iccpairs").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", (pairs.length / 3 + 1).toString)
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'doc_a BIGINT, doc_b BIGINT') AS j")
        .selectExpr("j.doc_a AS doc_a", "j.doc_b AS doc_b")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          IncrementalCc.mergeOnce(b, path, id)
          // the crash window under test: cluster state swapped,
          // checkpoint for this batch NOT yet committed
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    assert(graft.operators.MaterializedAgg
      .committedBatch(spark, path) >= 1L,
      "batch 1's state swap happened before the kill")
    val q2 = run() // restart from the SAME checkpoint → batch 1 replays
    q2.processAllAvailable()
    q2.stop()
    val oneShot = ConnectedComponents
      .labels(pairs.toSeq.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelsOf(path) === oneShot,
      "post-recovery clusters must equal the one-shot closure")
    EmbeddedLog.dropTopic("iccpairs")
  }

  test("replayed batch id is a no-op (inherited X98 exactly-once)") {
    val path = tmpDir("icc-replay") + "/state"
    val d = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    IncrementalCc.mergeOnce(d, path, 0L)
    val before = labelsOf(path)
    IncrementalCc.mergeOnce(d, path, 0L)
    assert(labelsOf(path) === before)
  }
}
