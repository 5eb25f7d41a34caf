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

  // ---- mid-swap kill windows ------------------------------------------
  // The swap is: write tmp → marker → ready sentinel → rename live dir
  // to .old → rename tmp in → delete .old. Each test below stages the
  // EXACT on-disk state a kill at one of those points leaves behind,
  // then proves recovery yields the full batches-0..2 state with no
  // loss and no double-count. (The pre-fix delete-then-rename shape
  // failed the "between renames" window catastrophically: no live dir,
  // so a replayed mergeOnce silently re-initialized from the delta.)

  private def slices3 = (0 to 2).map(b => ev.filter(col("event_id") % 3 === b))

  private def fs = new org.apache.hadoop.fs.Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  /** A state dir with batches 0 and 1 committed via mergeOnce. */
  private def stateThroughBatch1(path: String): Unit = {
    MaterializedAgg.mergeOnce(slices3(0), path, 0L)
    MaterializedAgg.mergeOnce(slices3(1), path, 1L)
  }

  /** The fully-committed batches-0..2 reference snapshot. */
  private lazy val fullState: Seq[(String, Long, Double, Double, Double,
      Double)] = {
    val p = tmpDir("matagg-ref") + "/state"
    (0 to 2).foreach(b => MaterializedAgg.mergeOnce(slices3(b), p, b.toLong))
    snapshot(p)
  }

  /** Build the batch-2 swap's tmp payload (data + marker, as the swap
    * leaves it just before the ready sentinel) at `dest`.
    */
  private def stageBatch2Tmp(fromBatch1: String, dest: String): Unit = {
    val scratch = tmpDir("matagg-scratch") + "/state"
    org.apache.hadoop.fs.FileUtil.copy(fs, hp(fromBatch1), fs, hp(scratch),
      false, spark.sparkContext.hadoopConfiguration)
    MaterializedAgg.mergeOnce(slices3(2), scratch, 2L)
    require(fs.rename(hp(scratch), hp(dest)))
  }

  test("kill between rename-away and rename-in (NO live dir; .old + " +
      "ready tmp): replayed mergeOnce rolls forward — no loss, no " +
      "double-count, no silent re-init") {
    val path = tmpDir("matagg-w1") + "/state"
    stateThroughBatch1(path)
    stageBatch2Tmp(path, path + ".tmp")
    fs.create(hp(path + ".tmp/_swap_ready"), true).close()
    require(fs.rename(hp(path), hp(path + ".old")))
    assert(!fs.exists(hp(path)), "window staged: no live state dir")
    // the driver restarts and foreachBatch re-delivers batch 2
    MaterializedAgg.mergeOnce(slices3(2), path, 2L)
    assert(MaterializedAgg.committedBatch(spark, path) === 2L)
    assert(snapshot(path) === fullState,
      "recovery must yield the exact batches-0..2 state")
    assert(!fs.exists(hp(path + ".old")) && !fs.exists(hp(path + ".tmp")))
  }

  test("kill after the ready sentinel, before rename-away (live dir + " +
      "ready tmp): recovery commits the candidate; the replay skips") {
    val path = tmpDir("matagg-w2") + "/state"
    stateThroughBatch1(path)
    stageBatch2Tmp(path, path + ".tmp")
    fs.create(hp(path + ".tmp/_swap_ready"), true).close()
    MaterializedAgg.mergeOnce(slices3(2), path, 2L)
    assert(snapshot(path) === fullState, "batch 2 must commit exactly once")
  }

  test("kill after rename-in, before .old cleanup: recovery drops the " +
      "leftover and the state is intact") {
    val path = tmpDir("matagg-w3") + "/state"
    stateThroughBatch1(path)
    // .old = the superseded batch-1 state; live dir = batch-2 state
    // still carrying its in-dir ready sentinel
    require(fs.rename(hp(path), hp(path + ".old")))
    stageBatch2Tmp(path + ".old", path)
    fs.create(hp(path + "/_swap_ready"), true).close()
    MaterializedAgg.mergeOnce(slices3(2), path, 2L)
    assert(snapshot(path) === fullState)
    assert(!fs.exists(hp(path + ".old")) &&
      !fs.exists(hp(path + "/_swap_ready")))
  }

  test("kill mid-tmp-write (tmp WITHOUT the ready sentinel) rolls back: " +
      "the replay then merges cleanly") {
    val path = tmpDir("matagg-w4") + "/state"
    stateThroughBatch1(path)
    fs.mkdirs(hp(path + ".tmp"))
    val out = fs.create(hp(path + ".tmp/part-00000.parquet"), true)
    out.write("not parquet — a torn write".getBytes); out.close()
    MaterializedAgg.mergeOnce(slices3(2), path, 2L)
    assert(snapshot(path) === fullState,
      "rolled-back attempt must not poison the real merge")
  }

  test("kill-storm property: ten merges, each preceded by a SEEDED " +
      "random staged crash window from the previous attempt — replay " +
      "always converges to the one-shot state") {
    val rnd = new scala.util.Random(42)
    val path = tmpDir("matagg-storm") + "/state"
    val slices = (0 until 10).map(b => ev.filter(col("event_id") % 10 === b))
    slices.zipWithIndex.foreach { case (d, b) =>
      // stage a random wreck of a HALF-DONE attempt at this batch
      // before the "driver restart" calls mergeOnce
      rnd.nextInt(4) match {
        case 0 => // torn tmp write, no ready sentinel
          fs.mkdirs(hp(path + ".tmp"))
          val out = fs.create(hp(path + ".tmp/part-0.parquet"), true)
          out.write("torn".getBytes); out.close()
        case 1 if fs.exists(hp(path)) => // stale .old from a prior swap
          org.apache.hadoop.fs.FileUtil.copy(fs, hp(path), fs,
            hp(path + ".old"), false,
            spark.sparkContext.hadoopConfiguration)
        case 2 if fs.exists(hp(path)) =>
          // ready sentinel accidentally inside the LIVE dir (kill
          // after rename-in, before cleanup)
          fs.create(hp(path + "/_swap_ready"), true).close()
        case _ => () // clean arrival
      }
      MaterializedAgg.mergeOnce(d, path, b.toLong)
    }
    val oneShot = tmpDir("matagg-storm-ref") + "/state"
    MaterializedAgg.init(ev, oneShot)
    assert(snapshot(path) === snapshot(oneShot),
      "storm-recovered state must equal the one-shot state")
    assert(MaterializedAgg.committedBatch(spark, path) === 9L)
  }

  test("X98 streaming form survives a REAL kill between state swap and " +
      "checkpoint commit (X71 source): restart replays the batch id, " +
      "mergeOnce skips it, read-back ≡ one-shot") {
    import graft.streaming.EmbeddedLog
    val path = tmpDir("matagg-ks") + "/state"
    val ckpt = tmpDir("matagg-ks-ckpt")
    EmbeddedLog.createTopic("magg", 2)
    val rows = (0 until 40).map { i =>
      (if (i % 2 == 0) "a" else "b", i.toDouble, (i % 7).toLong)
    }
    rows.zipWithIndex.foreach { case ((g, v, u), i) =>
      EmbeddedLog.sendString("magg", g,
        s"""{"g":"$g","v":$v,"u":$u}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[graft.streaming.EmbeddedLogProvider].getName)
        .option("topic", "magg").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "15")
        .load()
        .selectExpr("from_json(CAST(value AS STRING), " +
          "'g STRING, v DOUBLE, u BIGINT') AS j")
        .selectExpr("j.g AS g", "j.v AS v", "j.u AS u")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          MaterializedAgg.mergeOnce(b, path, id)
          // the crash window under test: state swapped, checkpoint
          // for this batch NOT yet committed
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    assert(MaterializedAgg.committedBatch(spark, path) >= 1L,
      "batch 1's state swap happened before the kill")
    val q2 = run() // restart from the SAME checkpoint → batch 1 replays
    q2.processAllAvailable()
    q2.stop()
    val ref = tmpDir("matagg-ks-ref") + "/state"
    MaterializedAgg.init(rows.toDF("g", "v", "u"), ref)
    assert(snapshot(path) === snapshot(ref),
      "post-recovery read-back must equal the one-shot GROUP BY state")
    EmbeddedLog.dropTopic("magg")
  }
}
