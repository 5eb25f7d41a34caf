package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AnnLsh.nearPairs]] — the embedding member of the near-dup mining
  * family. Mirrors the text-side closure test
  * (ConnectedComponentsSpec "closure over the LSH pair miner"): on a
  * PLANTED corpus whose in-cluster cosines sit far above threshold —
  * where 16×8-bit sign-LSH recall is 1.0 and the exact-cosine verify
  * keeps precision exact — the mined pairs must equal the brute-force
  * exact pairs, and the transitive closure over them must equal the
  * exact-pair closure.
  */
class AnnNearPairsSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val MinCos = 0.9

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))

  /** Clusters are perturbation CHAINS off one base vector, so chain ends
    * need not be pairwise-similar themselves and closure does real work.
    */
  private def plantedCorpus(seed: Int): Seq[(Long, Array[Double])] = {
    val rnd = new java.util.Random(seed)
    def fresh(): Array[Double] =
      normalize(Array.fill(Dim)(rnd.nextGaussian()))
    def perturb(v: Array[Double]): Array[Double] =
      normalize(v.zip(Array.fill(Dim)(rnd.nextGaussian() * 0.03))
        .map { case (a, b) => a + b })
    var id = 0L
    (0 until 8).flatMap { _ =>
      // sizes 1..7: long chains accumulate enough angle that their ends
      // fall BELOW MinCos (neighbor cosine ≈ 0.97) — the closure must
      // then do real transitive work
      val depth = 1 + rnd.nextInt(7)
      Iterator.iterate(fresh())(perturb).take(depth).toSeq.map { v =>
        id += 1; (id, v)
      }
    }
  }

  test("mined pairs equal exact pairs and closures agree (planted clusters)") {
    for (seed <- Seq(11, 37)) {
      val rows = plantedCorpus(seed)
      val docs = rows.map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "embedding")

      // exact truth: brute-force cosine over all pairs, driver-side
      val exactPairs = (for {
        (a, va) <- rows; (b, vb) <- rows
        if a < b && cosine(va, vb) >= MinCos
      } yield (a, b)).toSet
      assert(exactPairs.nonEmpty, s"seed=$seed: corpus planted no pairs")

      val mined = AnnLsh.nearPairs(docs, MinCos)
      val minedSet = mined.select(col("ia"), col("ib"))
        .as[(Long, Long)].collect().toSet
      // recall must be 1.0 here, or the closure comparison is vacuous;
      // precision is exact by construction (cosine verify)
      assert(minedSet === exactPairs,
        s"seed=$seed: LSH recall < 1.0 on the planted corpus")

      // closure over mined pairs == closure over exact pairs
      val viaLsh = ConnectedComponents
        .labels(mined.select(col("ia").as("doc_a"), col("ib").as("doc_b")))
        .as[(Long, Long)].collect().toMap
      val viaExact = ConnectedComponents
        .labels(exactPairs.toSeq.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(viaLsh === viaExact, s"seed=$seed")

      // non-vacuous: some component must contain a pair that was NOT
      // directly mined (chain ends joined only transitively)
      val comps = viaExact.groupBy(_._2).values.map(_.keys.toSeq)
      val indirect = comps.exists(ids => (for {
        a <- ids; b <- ids if a < b
      } yield (a, b)).exists(p => !exactPairs.contains(p)))
      assert(indirect, s"seed=$seed: closure did no transitive work")
    }
  }

  test("nearPairs broadcasts NOTHING (both sides are the corpus)") {
    // the scaladoc claim, asserted: unlike topK there is no bounded
    // query side, so no join may carry a broadcast hint — the bucket
    // self-join and the verify joins must all be free to shuffle
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val optimized = AnnLsh.nearPairs(emb, 0.8)
      .asInstanceOf[ClassicDataset[_]].queryExecution.optimizedPlan
    val hinted = optimized.collect {
      case j: Join if j.hint.leftHint.exists(_.strategy.isDefined) ||
        j.hint.rightHint.exists(_.strategy.isDefined) => j
    }
    assert(hinted.isEmpty,
      s"nearPairs must not hint any broadcast:\n${hinted.mkString("\n").take(1500)}")
  }

  test("planted half-scaled duplicates are always recalled (q76 shape)") {
    // scaling by 0.5 flips no projection sign, so a duplicate lands in
    // the SAME bucket in every table — candidate generation cannot miss
    // it regardless of seed or banding parameters
    val rows = plantedCorpus(7)
    val base = rows.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val planted = base.select((col("vec_id") + lit(1000L)).as("vec_id"),
      transform(col("embedding"), x => x * lit(0.5d)).as("embedding"))
    val mined = AnnLsh.nearPairs(base.union(planted), minCos = 0.999)
      .select(col("ia"), col("ib")).as[(Long, Long)].collect().toSet
    val expected = rows.map { case (id, _) => (id, id + 1000L) }.toSet
    assert(mined.intersect(expected) === expected,
      "every planted duplicate pair must be mined")
    mined.diff(expected).foreach { case (a, b) =>
      // anything extra must be a genuine ≥0.999 cosine pair
      val vec = rows.toMap
      def of(i: Long) = if (i >= 1000L) vec(i - 1000L) else vec(i)
      assert(cosine(of(a), of(b)) >= 0.999, s"spurious pair ($a,$b)")
    }
  }
}
