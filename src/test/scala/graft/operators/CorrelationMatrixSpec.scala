package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[CorrelationMatrix]] (X102) oracles: exact ±1 on exactly linear
  * columns, ~0 on an orthogonal construction, covariance equal to a
  * driver-side exact computation, and the streaming moment state
  * slicing-invariant + replay-safe (inherited X98 machinery).
  */
class CorrelationMatrixSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("exactly linear columns give corr exactly ±1; an orthogonal " +
      "construction gives ~0") {
    val df = (1 to 1000).map { i =>
      val x = (i % 97).toDouble
      // y = 3x + 5 exactly; z alternates sign independently of x
      (x, 3.0 * x + 5.0, if (i % 2 == 0) 1.0 else -1.0)
    }.toDF("x", "y", "z")
    val out = CorrelationMatrix.corrFrom(CorrelationMatrix
      .momentPartials(df, Seq(("x", "y"), ("x", "z"))))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("x~y") === 1.0, "linear pair must be exactly 1")
    assert(math.abs(out("x~z")) < 0.05, s"orthogonal pair ${out("x~z")}")
  }

  test("covariance equals the driver-side exact computation") {
    val rows = (1 to 500).map(i =>
      ((i % 13).toDouble, (i % 7).toDouble))
    val df = rows.toDF("x", "y")
    val got = CorrelationMatrix.corrFrom(CorrelationMatrix
      .momentPartials(df, Seq(("x", "y")))).collect().head
    val n = rows.length.toDouble
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxy = rows.map(p => p._1 * p._2).sum
    val cov = (n * sxy - sx * sy) / (n * (n - 1))
    assert(got.getDouble(2) === math.rint(cov * 1e6) / 1e6,
      s"cov ${got.getDouble(2)} vs driver $cov")
  }

  test("streaming moments: merged over slices == one-shot; replayed " +
      "batch id is a no-op") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val pairs = Seq(("l_quantity", "l_extendedprice"))
    def build(slices: Seq[org.apache.spark.sql.DataFrame]): String = {
      val path = tmpDir("corr-stream") + "/state"
      slices.zipWithIndex.foreach { case (s, i) =>
        CorrelationMatrix.mergeMomentsOnce(s, pairs, path, i.toLong)
      }
      path
    }
    val merged = build(
      (0 to 3).map(b => li.filter(col("l_orderkey") % 4 === b)))
    val oneShot = build(Seq(li))
    def snap(p: String): Seq[String] =
      CorrelationMatrix.readCorr(spark, p).collect().map(_.toString).toSeq
    assert(snap(merged) === snap(oneShot),
      "decimal moments must merge exactly under slicing")
    val before = snap(merged)
    CorrelationMatrix.mergeMomentsOnce(li, pairs, merged, 2L) // replay id
    assert(snap(merged) === before, "replayed batch double-counted")
    // batch query parity: the streamed state reproduces q150's row
    val q150row = CorrelationMatrix.corrFrom(CorrelationMatrix
      .momentPartials(li, pairs)).collect().map(_.toString).toSeq
    assert(snap(oneShot) === q150row)
  }
}
