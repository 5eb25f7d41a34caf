package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SequentialPatterns]] (X170) oracles: order matters (A-then-B is
  * supported while B-then-A is not on a strictly ordered session), the
  * 30-minute session cut separates occurrences that a flat scan would
  * pair, the first(a) < last(b) existence trick handles the A,B,A
  * interleaving in both directions, and confidence divides by
  * sessions-containing-a, not total sessions.
  */
class SequentialPatternsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  /** (user, minute, type) triples → pattern rows keyed (a, b). */
  private def run(events: Seq[(Long, Long, String)])
      : Map[(String, String), (Long, Long, Double)] = {
    val df = events.zipWithIndex
      .map { case ((u, m, ty), i) => (u, ts(m), i.toLong, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    SequentialPatterns.patterns(df).collect().map { r =>
      (r.getAs[String]("ty_a"), r.getAs[String]("ty_b")) ->
        ((r.getAs[Long]("support"), r.getAs[Long]("sessions_with_a"),
          r.getAs[Double]("confidence")))
    }.toMap
  }

  test("strict order: A at t0, B at t1 supports A->B only") {
    val out = run(Seq((1L, 0L, "A"), (1L, 1L, "B")))
    assert(out.contains(("A", "B")))
    assert(!out.contains(("B", "A")))
    assert(out(("A", "B")) === ((1L, 1L, 1.0)))
  }

  test("session cut: a 31-minute gap between A and B kills the " +
      "pattern; 29 minutes keeps it") {
    assert(run(Seq((1L, 0L, "A"), (1L, 31L, "B"))).isEmpty)
    assert(run(Seq((1L, 0L, "A"), (1L, 29L, "B")))
      .contains(("A", "B")))
  }

  test("interleaving A,B,A: first(A) < last(B) and first(B) < last(A) " +
      "— both directions supported by the one session") {
    val out = run(Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "A")))
    assert(out(("A", "B"))._1 === 1L)
    assert(out(("B", "A"))._1 === 1L)
  }

  test("confidence denominator is sessions WITH a: user2's B-only " +
      "session lowers confidence(B->A) but not confidence(A->B)") {
    val out = run(Seq(
      (1L, 0L, "A"), (1L, 1L, "B"),
      (2L, 0L, "B")))
    assert(out(("A", "B")) === ((1L, 1L, 1.0)))
    assert(!out.contains(("B", "A")))
    // B->A has no support; sessions_with_a only shows on present rows
  }

  test("q209 at sf0.001 ≡ driver replay over the same session cut") {
    val rows = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    // driver sessionize: per user, order (ts, event_id), cut > 1800 s
    val typePos = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._2.getTime, e._3))
      var sid = 0L
      var last: Option[Long] = None
      val tagged = ordered.map { e =>
        if (last.exists(l => (e._2.getTime - l) / 1000.0 > 1800) ||
          last.isEmpty) sid += 1
        last = Some(e._2.getTime)
        (u, sid, e._4)
      }
      tagged.zipWithIndex.groupBy { case ((_, s, ty), _) => (s, ty) }
        .map { case ((s, ty), occ) =>
          ((u, s, ty), (occ.map(_._2).min, occ.map(_._2).max))
        }
    }
    val bySession = typePos.groupBy { case ((u, s, _), _) => (u, s) }
    val support = bySession.values.flatMap { tys =>
      for {
        ((_, _, a), (fa, _)) <- tys
        ((_, _, b), (_, lb)) <- tys
        if a != b && fa < lb
      } yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val withA = typePos.groupBy { case ((_, _, ty), _) => ty }
      .map { case (ty, v) => ty -> v.size.toLong }
    val got = SequentialPatterns.q209
      .build(spark, sf0001).collect().map { r =>
        (r.getAs[String]("ty_a"), r.getAs[String]("ty_b")) ->
          ((r.getAs[Long]("support"), r.getAs[Long]("sessions_with_a")))
      }.toMap
    assert(got.keySet === support.keySet)
    got.foreach { case (k, (sup, swa)) =>
      assert(sup === support(k), k)
      assert(swa === withA(k._1), k)
    }
  }
}
