package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.MockScorers.aspects

/** [[AspectComention]] (X206) oracles: q240 at sf0.001 ≡ a driver
  * replay of the census over the scorer's own predictions (pair
  * identity, counts, joint-negatives, the lift double tree), and the
  * structural invariants (upper-triangle pinned order, n_both ≤
  * min(n_a, n_b), lift·n_a·n_b = n_both·N exactly).
  */
class AspectComentionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val got =
    AspectComention.q240.build(spark, sf0001).collect().map { r =>
      ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))
    }.toMap

  private lazy val scored = PipelineQueries.scores(spark, sf0001)
    .collect().map { r =>
      aspects.indices.map(i =>
        r.getInt(r.fieldIndex(aspects(i).toLowerCase + "_pred")))
    }

  test("q240 at sf0.001 == driver replay over the scorer output") {
    val nDocs = scored.length.toLong
    val singles = aspects.indices
      .map(i => i -> scored.count(_(i) != 0).toLong).toMap
    val expected = (for {
      i <- aspects.indices; j <- aspects.indices if i < j
      both = scored.count(p => p(i) != 0 && p(j) != 0).toLong
      if both > 0
    } yield {
      val neg = scored.count(p => p(i) == 1 && p(j) == 1).toLong
      (aspects(i), aspects(j)) ->
        ((singles(i), singles(j), both, neg,
          (both * nDocs).toDouble / (singles(i) * singles(j)).toDouble))
    }).toMap
    assert(got.nonEmpty && got.keySet === expected.keySet)
    expected.foreach { case (k, v) =>
      assert(got(k) === v, s"pair $k")
    }
  }

  test("structural invariants: pinned aspect order, n_both bounded, " +
      "exact lift identity") {
    val order = aspects.zipWithIndex.toMap
    got.foreach { case ((a, b), (na, nb, nab, neg, lift)) =>
      assert(order(a) < order(b), "upper triangle in aspect_cols order")
      assert(nab <= math.min(na, nb) && neg <= nab)
      val n = scored.length.toLong
      assert(lift === (nab * n).toDouble / (na * nb).toDouble)
    }
  }
}
