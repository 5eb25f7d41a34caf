package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Planted oracles for the r13 data-audit tier — X114 Benford (q159),
  * X115 calibration/ECE (q160), X116 half-life decay (q161), X117 χ²
  * independence (q162). Each query's VALUE correctness is the DuckDB
  * hash check; these specs pin the statistical semantics on
  * constructed inputs where the right answer is known in closed form.
  */
class DataAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- X114 Benford -----------------------------------------------

  test("Benford: a stream built to the exact Benford frequencies " +
      "passes (chi2 ~ 0); a uniform-digit stream fails loudly") {
    val n = 100000
    // counts proportional to log10(1+1/d), first digit d via value d*111
    val conforming = (1 to 9).flatMap { d =>
      val cnt = math.round(BenfordAudit.P(d - 1) * n).toInt
      Seq.fill(cnt)(d.toLong * 111L)
    }
    val good = BenfordAudit.audit(conforming.toDF("c")).collect()
    assert(good.length === 9)
    assert(good.forall(_.getBoolean(5)), "conforming stream must pass")
    assert(good.head.getDouble(4) < 1.0, s"chi2 ${good.head.getDouble(4)}")

    val uniform = (1 to 9).flatMap(d => Seq.fill(n / 9)(d.toLong * 200L))
    val bad = BenfordAudit.audit(uniform.toDF("c")).collect()
    assert(bad.forall(!_.getBoolean(5)), "uniform digits must fail")
    assert(bad.head.getDouble(4) > 1000.0)
  }

  test("Benford: chi2 equals a driver replay on the corpus cents") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val cents = li.select(
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("c"))
    val got = BenfordAudit.audit(cents).collect()
    val digits = cents.collect().map(_.getLong(0).toString.head.asDigit)
    val n = digits.length.toDouble
    val chi = (1 to 9).map { d =>
      val o = digits.count(_ == d).toDouble
      val e = n * BenfordAudit.P(d - 1)
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(got.head.getDouble(4) - chi) < 1e-4,
      s"engine ${got.head.getDouble(4)} vs driver $chi")
  }

  // ---- X115 calibration / ECE -------------------------------------

  test("ECE: a perfectly calibrated score (bin-b outcome rate == bin " +
      "midpoint confidence) scores ~0; the anti-calibrated flip " +
      "scores ~0.8; both match a driver replay") {
    // 1000 users per bin at mu = bin midpoint; exactly conf fraction
    // positive → acc_b == conf_b per bin
    def plant(flip: Boolean) = (0 until 10).flatMap { b =>
      val mu = b * 100000L + 50000L
      val pos = ((b * 100000 + 50000) / 1000).toInt // conf·1000 users
      (0 until 1000).map { i =>
        val p = if (i < pos) 1L else 0L
        (if (flip) 1L - p else p, mu)
      }
    }
    val cal = CalibrationError.reliability(
      plant(flip = false).toDF("purchased", "mu")).collect()
    assert(cal.length === 10)
    assert(cal.head.getDouble(6) < 0.001,
      s"calibrated ECE ${cal.head.getDouble(6)}")
    val anti = CalibrationError.reliability(
      plant(flip = true).toDF("purchased", "mu")).collect()
    // gaps |1−2·conf_b| over conf 0.05..0.95 average to exactly 0.5
    assert(anti.head.getDouble(6) >= 0.5 - 1e-9,
      s"anti-calibrated ECE ${anti.head.getDouble(6)}")
    // driver replay of the calibrated table
    val rows = plant(flip = false)
    val byBin = rows.groupBy(_._2 * 10 / 1000000)
    val eceDriver = byBin.map { case (_, rs) =>
      val nb = rs.size.toDouble
      val acc = rs.count(_._1 == 1L) / nb
      val conf = rs.map(_._2).sum / nb / 1e6
      nb / rows.size * math.abs(acc - conf)
    }.sum
    assert(math.abs(cal.head.getDouble(6) - eceDriver) < 1e-6)
  }

  // ---- X116 half-life decay ---------------------------------------

  test("decayed counts: hand-computed fixture (ages 0,1,2 -> " +
      "1 + 1/2 + 1/4), horizon cutoff at H zeroes old events") {
    val rows = Seq(("a", 0), ("a", 1), ("a", 2),
      ("old", DecayedCounts.H), ("old", DecayedCounts.H + 100))
    val got = DecayedCounts.decayed(rows.toDF("event_type", "age"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("a") === 1.75)
    assert(got("old") === 0.0, "past-horizon events must weigh 0")
  }

  test("decayed counts: engine equals a driver replay on the corpus " +
      "(exact decimal sum of power-of-two weights)") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val refd = ev.map(_._2).maxBy(_.toEpochDay)
    val driver = ev.groupBy(_._1).map { case (t, rs) =>
      val s = rs.map { case (_, d) =>
        val age = (refd.toEpochDay - d.toEpochDay).toInt
        if (age >= DecayedCounts.H) BigInt(0)
        else BigInt(1) << (DecayedCounts.H - 1 - age)
      }.sum
      t -> math.rint(s.toDouble /
        (1L << (DecayedCounts.H - 1)).toDouble * 1e6) / 1e6
    }
    val evDf = spark.read.parquet(s"$sf0001/events.parquet")
    val ref = evDf.agg(max(to_date(col("ts"))).as("refd"))
    val got = DecayedCounts.decayed(evDf.join(broadcast(ref))
      .withColumn("age", datediff(col("refd"), to_date(col("ts"))))
      .select(col("event_type"), col("age")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    driver.foreach { case (t, v) =>
      assert(got(t) === v, s"$t: engine ${got(t)} vs driver $v")
    }
  }

  // ---- X118 streaming half-life maintenance -----------------------

  test("X118 maintained decayed counts == the batch q161 EXACTLY over " +
      "the same absorbed events, under two different slicings (the " +
      "state is the integer day histogram, not a sketch)") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    // batch reference over the full corpus
    val ref = ev.agg(max(to_date(col("ts"))).as("refd"))
    val batch = snap(DecayedCounts.decayed(ev.join(broadcast(ref))
      .withColumn("age", datediff(col("refd"), to_date(col("ts"))))
      .select(col("event_type"), col("age"))))
    def maintained(slices: Seq[org.apache.spark.sql.DataFrame])
        : String = {
      val path = tmpDir("decay") + "/state"
      slices.zipWithIndex.foreach { case (s, b) =>
        DecayedCounts.mergeDecayedOnce(s, path, b.toLong)
      }
      path
    }
    val byMod = maintained((0 to 3).map(b =>
      ev.filter(pmod(col("event_id"), lit(4L)) === b)))
    val byTime = maintained(Seq( // chronological arrival — the real shape
      ev.filter(dayofmonth(col("ts")) <= 10),
      ev.filter(dayofmonth(col("ts")) > 10 &&
        dayofmonth(col("ts")) <= 20),
      ev.filter(dayofmonth(col("ts")) > 20)))
    assert(snap(DecayedCounts.readDecayed(spark, byMod)) === batch)
    assert(snap(DecayedCounts.readDecayed(spark, byTime)) === batch)
    // bounded state: ≤ |types|·H day rows
    val stRows = spark.read.parquet(byMod).count()
    assert(stRows <= 5L * DecayedCounts.H, s"state $stRows rows")
    // replay no-op (X98 inheritance)
    val before = snap(DecayedCounts.readDecayed(spark, byMod))
    DecayedCounts.mergeDecayedOnce(ev, byMod, 1L)
    assert(snap(DecayedCounts.readDecayed(spark, byMod)) === before)
  }

  test("X118 horizon prune is lossless and bounds the state: days " +
      "older than H behind the newest absorbed day are dropped, and " +
      "the read-back equals the unpruned computation") {
    import java.sql.Date
    val path = tmpDir("decay-prune") + "/state"
    def day(i: Int) = Date.valueOf(java.time.LocalDate
      .of(2024, 1, 1).plusDays(i))
    // batch 0: 100 ancient events; batch 1: 10 events H+5 days later
    val old = (0 until 100).map(i =>
      ("a", new java.sql.Timestamp(day(0).getTime + i)))
    val fresh = (0 until 10).map(i =>
      ("a", new java.sql.Timestamp(day(DecayedCounts.H + 5).getTime + i)))
    DecayedCounts.mergeDecayedOnce(old.toDF("event_type", "ts"), path, 0L)
    DecayedCounts.mergeDecayedOnce(fresh.toDF("event_type", "ts"), path, 1L)
    // the ancient day is outside the horizon of the new reference —
    // pruned from state, weight would have been exactly 0 anyway
    assert(spark.read.parquet(path).count() === 1L)
    val got = DecayedCounts.readDecayed(spark, path).collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 10L, "n_events counts surviving days")
    assert(got.head.getDouble(2) === 10.0, "10 day-0 events weigh 1 each")
  }

  test("X118 streaming end-to-end: MemoryStream batches -> maintained " +
      "state == one-shot merge over the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmpDir("decay-stream") + "/state"
    val ckpt = tmpDir("decay-stream-ckpt")
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = (0 until 300).map(i =>
      (s"t${i % 3}", new java.sql.Timestamp(
        base + (i % 20).toLong * 86400000L)))
    val input = MemoryStream[(String, java.sql.Timestamp)](spark)
    def runAvailable(): Unit = {
      val q = DecayedCounts.stream(
        input.toDF().toDF("event_type", "ts"), path, ckpt)
      q.awaitTermination(120000)
    }
    input.addData(rows.take(150)); runAvailable()
    input.addData(rows.drop(150)); runAvailable()
    val ref = tmpDir("decay-stream-ref") + "/state"
    DecayedCounts.mergeDecayedOnce(rows.toDF("event_type", "ts"), ref, 0L)
    assert(DecayedCounts.readDecayed(spark, path).collect().map(_.toString)
      .toSeq === DecayedCounts.readDecayed(spark, ref).collect()
      .map(_.toString).toSeq)
  }

  // ---- X119 k-anonymity -------------------------------------------

  test("k-anonymity: a planted 3-row quasi-id class is flagged at " +
      "k=5, achieved_k and risk share are exact, and a uniform table " +
      "is k-anonymous") {
    val rows = (0 until 100).map(i => (i % 4, "seg")) ++
      Seq((9, "rare"), (9, "rare"), (9, "rare")) // a 3-row class
    val got = KAnonymity.audit(rows.toDF("nation", "segment"),
      Seq("nation", "segment"), k = 5).collect()
    assert(got.length === 5)
    val rare = got.find(_.getInt(0) == 9).get
    assert(rare.getLong(2) === 3L && rare.getBoolean(3),
      "the 3-row class must be at risk")
    assert(rare.getLong(4) === 3L, "achieved k = smallest class")
    assert(!rare.getBoolean(5), "table is NOT 5-anonymous")
    assert(math.abs(rare.getDouble(6) - 3.0 / 103.0) < 1e-5)
    val uniform = KAnonymity.audit(
      (0 until 100).map(i => (i % 4, "s")).toDF("nation", "segment"),
      Seq("nation", "segment"), k = 5).collect()
    assert(uniform.forall(r => !r.getBoolean(3) && r.getBoolean(5)))
    assert(uniform.head.getDouble(6) === 0.0)
  }

  // ---- X120 profile drift -----------------------------------------

  test("profile drift: planted null flood, cardinality collapse, and " +
      "bounds shift each fire their own verdict on their own column; " +
      "identical slices report no drift") {
    val ref = (0 until 1000)
      .map(i => (Some(i.toDouble), Some((i % 100).toLong), i.toDouble))
      .toDF("a", "b", "c")
    // a: 5% nulls (null flood); b: 100 -> 3 distinct (collapse);
    // c: max doubled (bounds shift)
    val cur = (0 until 1000).map { i =>
      (if (i % 20 == 0) None else Some(i.toDouble),
        Some((i % 3).toLong),
        if (i == 999) 2000.0 else i.toDouble)
    }.toDF("a", "b", "c")
    val raw: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _.cast("string")
    val cols = Seq(("a", raw), ("b", raw), ("c", raw))
    val got = ProfileDrift.diff(ref, cur, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getBoolean(6) && !got("b").getBoolean(6),
      "null flood fires on a only")
    assert(got("b").getBoolean(7) && !got("a").getBoolean(7),
      "cardinality collapse fires on b only")
    assert(got("c").getBoolean(8), "bounds shift fires on c")
    assert(got.values.forall(_.getBoolean(9)),
      "every planted column reports drifted")
    val same = ProfileDrift.diff(ref, ref, cols).collect()
    assert(same.forall(!_.getBoolean(9)),
      "identical slices must not drift")
  }

  // ---- X121 last-touch attribution --------------------------------

  test("attribution: the LAST preceding touch wins (view then click " +
      "-> click); out-of-window and touchless purchases are organic; " +
      "same-timestamp ties break by event_id; later touches never " +
      "attribute backwards") {
    val day = 86400000000L
    val rows = Seq(
      // user 1: view @0, click @1h, purchase @2h -> click (id 11)
      (10L, 1L, "view", 0L), (11L, 1L, "click", 3600000000L),
      (12L, 1L, "purchase", 7200000000L),
      // user 2: view @0, purchase @8d -> outside 7d lookback: organic
      (20L, 2L, "view", 0L), (21L, 2L, "purchase", 8L * day),
      // user 3: purchase with NO prior touch; a view AFTER it must
      // not attribute backwards
      (30L, 3L, "purchase", 0L), (31L, 3L, "view", 1000000L),
      // user 4: two touches at the SAME microsecond -> higher
      // event_id is "last" under the (us, event_id) order
      (40L, 4L, "view", 5L), (41L, 4L, "click", 5L),
      (42L, 4L, "purchase", 10L))
    val got = Attribution.lastTouch(
      rows.toDF("event_id", "user_id", "event_type", "us")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3)))
      .toMap
    assert(got(12L) === (11L, "click"))
    assert(got(21L) === (-1L, "organic"))
    assert(got(30L) === (-1L, "organic"))
    assert(got(42L) === (41L, "click"))
  }

  // ---- X122 conversion lag ----------------------------------------

  test("conversion lag: planted lags yield exact percentiles, " +
      "purchase-before-signup does not count as converted, " +
      "non-signup users are excluded") {
    val m = 1000000L
    val rows =
      // 4 converted users with lags 10s, 20s, 30s, 40s
      (1 to 4).flatMap(u => Seq(
        (u.toLong, "signup", 0L), (u.toLong, "purchase", u * 10L * m))) ++
      Seq(
        (5L, "signup", 100L * m), // never converted
        (6L, "purchase", 0L), (6L, "signup", 50L * m), // purchase first
        (7L, "view", 0L)) // no signup: excluded entirely
    val df = rows.toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val path = tmpDir("convlag")
    df.write.mode("overwrite").parquet(s"$path/events.parquet")
    val got = Attribution.q166.build(spark, path).collect().head
    assert(got.getLong(0) === 6L, "signups: users 1-6")
    assert(got.getLong(1) === 4L, "converted: only forward lags")
    // lags {10,20,30,40}: p25 = 17.5, p50 = 25, p75 = 32.5, p90 = 37
    assert(got.getDouble(3) === 17.5)
    assert(got.getDouble(4) === 25.0)
    assert(got.getDouble(5) === 32.5)
    assert(got.getDouble(6) === 37.0)
  }

  // ---- X117 chi-square independence -------------------------------

  test("chi-square: perfectly proportional factors score exactly 0; " +
      "a fully dependent table scores n*(k-1); corpus ~ driver replay") {
    // independent: every (segment, type) cell has the same count
    val indep = for (s <- 0L to 3L; t <- Seq("x", "y", "z");
      _ <- 1 to 50) yield (s, t)
    val gi = ChiSquareDrift.independence(indep.toDF("segment", "event_type"))
      .collect()
    assert(gi.head.getDouble(5) === 0.0)
    assert(gi.head.getLong(6) === 6L) // (4-1)(3-1)
    // fully dependent: segment s only ever emits type s → χ² = n(k−1)
    val dep = for (s <- 0L to 2L; _ <- 1 to 100) yield (s, s"t$s")
    val gd = ChiSquareDrift.independence(dep.toDF("segment", "event_type"))
      .collect()
    assert(math.abs(gd.head.getDouble(5) - 300.0 * 2) < 1e-6)
    // corpus replay
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(pmod(col("user_id"), lit(4L)).as("segment"),
        col("event_type"))
    val got = ChiSquareDrift.independence(ev).collect()
    val pairs = ev.collect().map(r => (r.getLong(0), r.getString(1)))
    val n = pairs.length.toDouble
    val cells = pairs.groupBy(identity).view.mapValues(_.length).toMap
    val rt = pairs.groupBy(_._1).view.mapValues(_.length).toMap
    val ct = pairs.groupBy(_._2).view.mapValues(_.length).toMap
    val chi = (for (s <- rt.keys; t <- ct.keys) yield {
      val o = cells.getOrElse((s, t), 0).toDouble
      val e = rt(s) * ct(t) / n
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(got.head.getDouble(5) - chi) < 1e-4,
      s"engine ${got.head.getDouble(5)} vs driver $chi")
  }
}
