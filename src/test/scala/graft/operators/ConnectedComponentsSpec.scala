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

  test("adaptive jumping closes a 64-node path inside the default cap") {
    // diameter 63 ≫ maxIter=20: plain propagation alone cannot converge,
    // so this passes only because jumping auto-enables at jumpAfter=8
    // (8 plain + O(log 63) jumped rounds). Forcing jumping OFF must
    // fail loudly on the same graph — proving the adaptive switch, not
    // a generous cap, is what closed it.
    val edges = (1L until 64L).map(i => i -> (i + 1))
    val m = ConnectedComponents.labels(pairs(edges: _*))
      .as[(Long, Long)].collect().toMap
    assert(m.values.toSet === Set(1L))
    assert(m.keySet === (1L to 64L).toSet)
    intercept[IllegalArgumentException] {
      ConnectedComponents.labels(pairs(edges: _*), jumpAfter = Int.MaxValue)
    }
  }

  test("closure over the LSH pair miner matches the exact-pair closure") {
    // The at-scale wiring is labels(nearDuplicates(...)) — LSH-mined
    // pairs, not the quadratic exact miner. On a PLANTED corpus whose
    // in-cluster similarity sits far above threshold (J ≳ 0.85, where
    // 16×2-band recall is ~1.0 and verification keeps precision exact),
    // the two closures must produce identical clusters. Each cluster is
    // a mutation CHAIN off one base text, so transitive closure does real
    // work (ends of a chain need not be pairwise-similar themselves).
    val vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "red green blue amber teal coral slate olive navy plum").split(" ")
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      def freshText(): Array[String] =
        Array.fill(60)(vocab(rnd.nextInt(vocab.length)))
      // drop one word per chain step: J between neighbors ~ 57/60
      def mutate(words: Array[String]): Array[String] = {
        val at = 1 + rnd.nextInt(words.length - 2)
        words.zipWithIndex.filter(_._2 != at).map(_._1)
      }
      var id = 0L
      val rows = (0 until 6).flatMap { _ =>
        val depth = 1 + rnd.nextInt(3) // cluster sizes 1..3
        val chain = Iterator.iterate(freshText())(mutate).take(depth).toSeq
        chain.map { words => id += 1; (id, words.mkString(" ")) }
      }
      val docs = rows.toDF("doc_id", "text")

      // exact truth: brute-force 3-gram Jaccard over all pairs
      val sh = MinHashDedup.shingles(docs)
        .as[(Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exactPairs = (for {
        a <- sh.keys; b <- sh.keys if a < b
        inter = sh(a).intersect(sh(b)).size.toDouble
        j = inter / (sh(a).size + sh(b).size - inter)
        if j >= 0.5
      } yield (a, b)).toSeq

      val mined = MinHashDedup.nearDuplicates(docs, 0.5)
        .select(col("doc_a"), col("doc_b"))
      // recall must be 1.0 here, or the closure comparison is vacuous
      val minedSet = mined.as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      assert(minedSet === exactPairs.toSet,
        s"seed=$seed: LSH recall < 1.0 on the planted corpus")

      val viaLsh = ConnectedComponents.labels(mined)
        .as[(Long, Long)].collect().toMap
      val viaExact = labelMap(exactPairs: _*)
      assert(viaLsh === viaExact, s"seed=$seed")
    }
  }
}
