package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[FriedmanTest]] (X233) oracles: the textbook χ² on a perfectly
  * consistent fixture, within-block midranks on ties, incomplete-
  * block exclusion, and the all-tied degenerate NULL.
  */
class FriedmanSpec extends SparkSpec {
  import spark.implicits._

  // cells = (week index, type, count)
  private def run(cells: Seq[(Int, String, Int)])
      : (Long, Long, Option[Double], Option[Boolean]) = {
    val dir = tmpDir("fr")
    cells.flatMap { case (wk, ty, c) =>
      (0 until c).map { i =>
        ((wk * 1000000 + i).toLong,
          new Timestamp((19705L + wk * 7L) * 86400000L + i * 1000L),
          i.toLong, ty, 1.0d, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = FriedmanTest.q265.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getBoolean(3)))
  }

  test("consistent ordering over 4 weeks of k=3: chi2 = 8, significant") {
    // counts 10,20,30 per week: ranks 1,2,3 -> textbook
    // chi2 = 12/(4*3*4)*(16+64+144) - 3*4*4 = 8 > 5.99
    val cells = for (w <- 0 to 3; (ty, c) <- Seq("a" -> 10, "b" -> 20,
      "c" -> 30)) yield (w, ty, c)
    val (n, k, chi2, sig) = run(cells)
    assert((n, k) === ((4L, 3L)))
    assert(chi2 === Some(8.0))
    assert(sig === Some(true))
  }

  test("within-block ties take midranks (doubled-rank fold)") {
    // week ranks: a and b tied at 10 (midrank 1.5 each), c = 3;
    // 3 such weeks: R = (4.5, 4.5, 9); n=3,k=3
    // chi2 (tie form) = 2*(4*(4.5^2+4.5^2+81) - 9*3*16*... use the
    // doubled algebra: r2 = (3,3,6) per week
    val cells = for (w <- 0 to 2; (ty, c) <- Seq("a" -> 10, "b" -> 10,
      "c" -> 30)) yield (w, ty, c)
    val (n, k, chi2, sig) = run(cells)
    assert((n, k) === ((3L, 3L)))
    // R2 = (9,9,18); S_rj2 = 81+81+324 = 486; n^2*k*(k+1)^2 = 432
    // num = 2*(486-432) = 108; s_r2sq = 3*(9+9+36) = 162;
    // n*k*(k+1)^2 = 144; den = 18 -> chi2 = 6
    assert(chi2 === Some(6.0))
    assert(sig === Some(true))
  }

  test("a week missing one type is excluded") {
    val cells = (for (w <- 0 to 3; (ty, c) <- Seq("a" -> 10, "b" -> 20,
      "c" -> 30)) yield (w, ty, c)) :+ ((9, "a", 5))
    val (n, _, _, _) = run(cells)
    assert(n === 4L)
  }

  test("all types tied in every week: denominator 0 -> NULL") {
    val cells = for (w <- 0 to 2; ty <- Seq("a", "b", "c"))
      yield (w, ty, 10)
    val (_, _, chi2, sig) = run(cells)
    assert(chi2 === None && sig === None)
  }
}
