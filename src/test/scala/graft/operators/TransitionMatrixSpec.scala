package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TransitionMatrix]] (X86) semantic oracles: a planted per-user
  * path yields exactly its transitions (never pairing across users),
  * probabilities row-normalize to 1, timestamp ties break on
  * event_id, and the result is partitioning-independent.
  */
class TransitionMatrixSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, Timestamp, Long, String)]): String = {
    val d = tmpDir("transitions")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def ts(s: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")

  test("planted paths: per-user transitions only, tie broken by " +
      "event_id, probabilities row-normalized") {
    // user 1: view->click->purchase; user 2: view->error
    // user 3: two events at the SAME ts — order must follow event_id
    val rows = Seq(
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "click"),
      (3L, ts(3), 1L, "purchase"),
      (4L, ts(1), 2L, "view"), (5L, ts(2), 2L, "error"),
      (6L, ts(5), 3L, "signup"), (7L, ts(5), 3L, "view"))
    val got = TransitionMatrix.q137.build(spark, dir(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set(("view", "click"), ("click", "purchase"),
      ("view", "error"), ("signup", "view")))
    // 'view' row: 1 to click + 1 to error → p = 0.5 each
    assert(got(("view", "click")) === ((1L, 0.5)))
    assert(got(("view", "error")) === ((1L, 0.5)))
    assert(got(("signup", "view")) === ((1L, 1.0)),
      "same-ts pair must order by event_id (6 -> 7)")
    // no cross-user pairing: user 1's purchase never pairs with user
    // 2's view
    assert(!got.contains(("purchase", "view")))
  }

  test("corpus: every from-row's probabilities sum to ~1 (micro-unit " +
      "rounding) and counts match a driver replay") {
    val rows = TransitionMatrix.q137.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4 * rs.length,
        s"row probabilities sum to $p")
    }
    val n = rows.map(_.getLong(2)).sum
    val events = spark.read.parquet(s"$sf0001/events.parquet").count()
    val users = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("user_id")).distinct().count()
    assert(n === events - users,
      "each user contributes exactly (events - 1) transitions")
  }
}
