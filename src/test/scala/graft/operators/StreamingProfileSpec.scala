package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[StreamingProfile]] (X100) oracles: profile and histogram states
  * merged batch-by-batch must equal the one-shot computation under ANY
  * slicing (the mergeable-state contract), the read-back must match a
  * direct batch recomputation, equi-depth boundaries from the frozen
  * grid must hit their target ranks within the crossing cell's
  * occupancy (the grid's honest error bound), and replay/exactly-once
  * is inherited from the shared X98 machinery.
  */
class StreamingProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
  private val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")

  private def buildProfile(slices: Seq[DataFrame]): String = {
    val path = tmpDir("sprof") + "/state"
    slices.zipWithIndex.foreach { case (s, i) =>
      StreamingProfile.mergeProfileOnce(s, cols, path, i.toLong)
    }
    path
  }

  private def snap(path: String): Seq[String] =
    StreamingProfile.readProfile(spark, path)
      .drop("approx_distinct") // sketch estimates compared separately
      .collect().map(_.toString).toSeq

  private def estimates(path: String): Map[String, Long] =
    StreamingProfile.readProfile(spark, path)
      .select(col("column_name"), col("approx_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("profile state: merged over two different slicings == one-shot " +
      "on every exact field; HLL estimates agree within 1%") {
    val oneShot = buildProfile(Seq(li))
    val byMod = buildProfile(
      (0 to 3).map(b => li.filter(col("l_orderkey") % 4 === b)))
    val byRange = buildProfile(Seq(
      li.filter(col("l_orderkey") < 300),
      li.filter(col("l_orderkey") >= 300)))
    assert(snap(byMod) === snap(oneShot))
    assert(snap(byRange) === snap(oneShot))
    // a UNION of HLL sketches is not bit-identical to the one-shot
    // sketch (mode promotions differ), but the estimates must agree
    val ref = estimates(oneShot)
    Seq(byMod, byRange).foreach { p =>
      estimates(p).foreach { case (c, est) =>
        assert(math.abs(est - ref(c)).toDouble / ref(c) < 0.01,
          s"$c sliced estimate $est vs one-shot ${ref(c)}")
      }
    }
  }

  test("profile read-back matches a direct batch computation; distinct " +
      "estimate within 5% of exact") {
    val path = buildProfile(
      (0 to 2).map(b => li.filter(col("l_orderkey") % 3 === b)))
    val got = StreamingProfile.readProfile(spark, path).collect()
      .map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val d = li.agg(count(lit(1)), countDistinct(col(c)),
        min(expr(s"try_cast($c AS DOUBLE)")),
        max(expr(s"try_cast($c AS DOUBLE)"))).first()
      val r = got(c)
      assert(r.getLong(1) === d.getLong(0), s"$c n_rows")
      assert(r.getLong(2) === 0L, s"$c n_nulls")
      val est = r.getLong(4).toDouble; val ex = d.getLong(1).toDouble
      assert(math.abs(est - ex) / ex < 0.05, s"$c distinct $est vs $ex")
      if (c == "l_returnflag") { // non-numeric: null bounds by contract
        assert(r.isNullAt(5) && r.isNullAt(6), s"$c bounds should be null")
      } else {
        assert(r.getDouble(5) === d.getDouble(2), s"$c min")
        assert(r.getDouble(6) === d.getDouble(3), s"$c max")
      }
    }
  }

  test("replayed batch id is a no-op (inherited X98 exactly-once)") {
    val path = tmpDir("sprof-replay") + "/state"
    val half = li.filter(col("l_orderkey") % 2 === 0)
    StreamingProfile.mergeProfileOnce(half, cols, path, 0L)
    val before = snap(path)
    StreamingProfile.mergeProfileOnce(half, cols, path, 0L)
    assert(snap(path) === before, "replayed batch double-counted")
  }

  test("grid histogram: merged == one-shot, and equi-depth boundaries " +
      "hit their target ranks within the crossing cell's occupancy") {
    val v = "l_extendedprice"
    val stats = li.agg(min(col(v)), max(col(v)), count(lit(1))).first()
    val (lo, hi) = (stats.getDouble(0), stats.getDouble(1) + 1e-9)
    val total = stats.getLong(2)
    def build(slices: Seq[DataFrame]): String = {
      val path = tmpDir("sgrid") + "/state"
      slices.zipWithIndex.foreach { case (s, i) =>
        StreamingProfile.mergeGridOnce(s, v, lo, hi, path, i.toLong)
      }
      path
    }
    val merged = build((0 to 3).map(b => li.filter(col("l_orderkey") % 4 === b)))
    val oneShot = build(Seq(li))
    def cells(p: String): Seq[(Int, Long, Double, Double)] =
      spark.read.parquet(p).selectExpr("cell", "n", "mn", "mx")
        .as[(Int, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(cells(merged) === cells(oneShot),
      "grid state must be slicing-invariant")
    val maxOcc = cells(merged).map(_._2).max
    val k = 10
    val bounds = StreamingProfile.equiDepth(spark, merged, k, lo, hi)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    // rank check: #(v <= boundary_i) must be within one crossing-cell
    // occupancy of i·total/k — the grid's resolution guarantee
    (1 until k).foreach { i =>
      val b = bounds(i - 1)._3
      val rank = li.filter(col(v) <= b).count()
      val target = i.toLong * total / k
      assert(math.abs(rank - target) <= maxOcc,
        s"boundary $i: rank $rank vs target $target (maxOcc $maxOcc)")
    }
    // outermost edges are the true min/max, not grid edges
    assert(bounds.head._2 === stats.getDouble(0))
    assert(bounds.last._3 === stats.getDouble(1))
  }

  test("grouped grid: per-group merged == one-shot, and every group's " +
      "equi-depth boundaries hit their per-group rank targets within " +
      "crossing-cell occupancy") {
    val v = "l_extendedprice"; val g = "l_returnflag"
    val stats = li.agg(min(col(v)), max(col(v))).first()
    val (lo, hi) = (stats.getDouble(0), stats.getDouble(1) + 1e-9)
    def build(slices: Seq[DataFrame]): String = {
      val path = tmpDir("ggrid") + "/state"
      slices.zipWithIndex.foreach { case (s, i) =>
        StreamingProfile.mergeGroupedGridOnce(s, g, v, lo, hi, path,
          i.toLong)
      }
      path
    }
    val merged = build(
      (0 to 3).map(b => li.filter(col("l_orderkey") % 4 === b)))
    val oneShot = build(Seq(li))
    def cells(p: String): Seq[String] =
      spark.read.parquet(p).selectExpr("g", "cell", "n", "mn", "mx")
        .collect().map(_.toString).sorted.toSeq
    assert(cells(merged) === cells(oneShot))
    val k = 4
    val bounds = StreamingProfile.equiDepthBy(spark, merged, k, lo, hi)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val groups = li.select(col(g)).distinct().collect()
      .map(_.getString(0)).toSeq
    groups.foreach { grp =>
      val total = li.filter(col(g) === grp).count()
      val maxOcc = spark.read.parquet(merged)
        .filter(col("g") === grp).agg(max(col("n"))).first().getLong(0)
      val mine = bounds.filter(_._1 == grp)
      assert(mine.length === k - 1, s"group $grp boundary count")
      mine.foreach { case (_, bi, b) =>
        val rank = li.filter(col(g) === grp && col(v) <= b).count()
        val target = bi.toLong * total / k
        assert(math.abs(rank - target) <= maxOcc,
          s"group $grp boundary $bi: rank $rank vs $target (occ $maxOcc)")
      }
    }
  }

  test("streaming form end-to-end: MemoryStream batches -> profile " +
      "state == one-shot over the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmpDir("sprof-stream") + "/state"
    val ckpt = tmpDir("sprof-stream-ckpt")
    val input = MemoryStream[(Long, Double)](spark)
    def runAvailable(): Unit = {
      val q = StreamingProfile.streamProfile(
        input.toDF().toDF("a", "b"), Seq("a", "b"), path, ckpt)
      q.awaitTermination(120000)
    }
    val rows = (0 until 100).map(i => (i.toLong % 13, i * 0.5))
    input.addData(rows.take(60))
    runAvailable()
    input.addData(rows.drop(60))
    runAvailable()
    val ref = tmpDir("sprof-stream-ref") + "/state"
    StreamingProfile.mergeProfileOnce(
      rows.toDF("a", "b"), Seq("a", "b"), ref, 0L)
    assert(snap(path) === snap(ref))
  }

  test("X100 profile maintenance survives a REAL kill between state " +
      "swap and checkpoint commit (X71 source): restart replays the " +
      "batch id, merge skips it, read-back == one-shot on every exact " +
      "field with HLL within 1%") {
    import graft.streaming.EmbeddedLog
    val path = tmpDir("sprof-ks") + "/state"
    val ckpt = tmpDir("sprof-ks-ckpt")
    EmbeddedLog.createTopic("sprof", 2)
    val rows = (0 until 90).map(i => (i.toLong % 17, i * 0.25))
    rows.zipWithIndex.foreach { case ((a, b), i) =>
      EmbeddedLog.sendString("sprof", a.toString,
        s"""{"a":$a,"b":$b}""", 1000L + i)
    }
    val killOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[graft.streaming.EmbeddedLogProvider].getName)
        .option("topic", "sprof").option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "35")
        .load()
        .selectExpr(
          "from_json(CAST(value AS STRING), 'a BIGINT, b DOUBLE') AS j")
        .selectExpr("j.a AS a", "j.b AS b")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamingProfile.mergeProfileOnce(b, Seq("a", "b"), path, id)
          // the crash window under test: profile state swapped,
          // checkpoint for this batch NOT yet committed
          if (id == 1L && killOnce.getAndSet(false))
            throw new RuntimeException("injected kill after state swap")
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable() }
    assert(MaterializedAgg.committedBatch(spark, path) >= 1L,
      "batch 1's state swap happened before the kill")
    val q2 = run() // restart from the SAME checkpoint -> batch 1 replays
    q2.processAllAvailable()
    q2.stop()
    val ref = tmpDir("sprof-ks-ref") + "/state"
    StreamingProfile.mergeProfileOnce(
      rows.toDF("a", "b"), Seq("a", "b"), ref, 0L)
    assert(snap(path) === snap(ref),
      "post-recovery profile must equal the one-shot on exact fields")
    val refEst = estimates(ref)
    estimates(path).foreach { case (c, est) =>
      assert(math.abs(est - refEst(c)).toDouble /
        math.max(1L, refEst(c)) < 0.01,
        s"$c estimate $est vs one-shot ${refEst(c)}")
    }
    EmbeddedLog.dropTopic("sprof")
  }
}
