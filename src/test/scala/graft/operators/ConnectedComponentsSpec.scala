package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ConnectedComponents.labels]]: min-label propagation must transitively
  * close pair lists into components — the property q68 relies on.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*) =
    ps.toDF("doc_a", "doc_b")

  private def labelMap(ps: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.labels(pairs(ps: _*))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component labelled by its minimum") {
    // 1-2, 2-3, 3-4: endpoints 1 and 4 were never a pair, but must share
    // a label (this is exactly what pair-mining output lacks). Diameter 3
    // forces multiple propagation iterations.
    val m = labelMap(1L -> 2L, 2L -> 3L, 3L -> 4L)
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint cliques keep distinct labels") {
    val m = labelMap(10L -> 11L, 11L -> 10L, 5L -> 7L)
    assert(m === Map(10L -> 10L, 11L -> 10L, 5L -> 5L, 7L -> 5L))
  }

  test("label choice is direction-independent (edges are symmetrized)") {
    // min id appears only on the b side: propagation must still pick it
    val m = labelMap(9L -> 2L, 9L -> 8L)
    assert(m === Map(2L -> 2L, 8L -> 2L, 9L -> 2L))
  }

  test("empty pair list yields empty labels, converged") {
    val m = labelMap()
    assert(m.isEmpty)
  }

  test("non-convergence within maxIter fails loudly, not wrongly") {
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.labels(pairs(1L -> 2L, 2L -> 3L, 3L -> 4L),
        maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("long path converges within the default iteration budget") {
    // a 12-node path is far past any near-dup cluster diameter; the
    // default cap must still close it (propagation halves nothing — one
    // hop per iteration — so this exercises ~11 iterations)
    val edges = (1L until 12L).map(i => i -> (i + 1))
    val m = labelMap(edges: _*)
    assert(m.values.toSet === Set(1L))
    assert(m.keySet === (1L to 12L).toSet)
  }
}
