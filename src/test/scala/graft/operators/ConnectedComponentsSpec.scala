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

  test("pointer jumping closes a 12-node path in half the rounds") {
    val edges = (1L until 12L).map(i => i -> (i + 1))
    // plain propagation moves the min label one hop per round (~11
    // rounds); the label(label(id)) shortcut halves remaining distance
    val m = ConnectedComponents.labels(pairs(edges: _*), maxIter = 6,
      pointerJump = true).as[(Long, Long)].collect().toMap
    assert(m.values.toSet === Set(1L))
    intercept[IllegalArgumentException] {
      ConnectedComponents.labels(pairs(edges: _*), maxIter = 6)
    }
  }

  test("random graphs match a driver-side union-find (property)") {
    for (seed <- Seq(7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 24
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.07
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        // reference: plain union-find with min-id relabel
        val parent = Array.tabulate(n.toInt)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(ra) = rb
        }
        val expected = (0 until n.toInt)
          .groupBy(find).values
          .filter(_.size > 1) // isolated nodes never appear in the pair list
          .flatMap(g => g.map(m => m.toLong -> g.min.toLong)).toMap
        val got = labelMap(edges: _*)
        assert(got === expected, s"seed=$seed edges=$edges")
        val jumped = ConnectedComponents.labels(pairs(edges: _*),
          pointerJump = true).as[(Long, Long)].collect().toMap
        assert(jumped === expected, s"pointerJump seed=$seed edges=$edges")
      }
    }
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
