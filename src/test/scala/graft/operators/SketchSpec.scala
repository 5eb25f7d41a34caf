package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force oracles for the sketch operators (the driver only rows-
  * checks these — correctness is proven here).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with planted near-duplicates. */
  private lazy val corpus: DataFrame = {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest chasing small animals all day long"
    val words = base.split(" ")
    def mutate(drop: Int): String =
      words.zipWithIndex.filter(_._2 % 37 != drop * 5 + 1).map(_._1).mkString(" ")
    val rows = Seq(
      (0L, base), (1L, base), // exact dup
      (2L, mutate(0)), // near dup of 0
      (3L, words.reverse.mkString(" ")), // same bag, different order
      (4L, "completely different content about database engines and query planners optimizing joins"),
      (5L, "another unrelated text mentioning vehicles cameras frames detection counting"),
      (6L, base + " extra trailing tokens appended here")) // near dup of 0
    rows.toDF("doc_id", "text")
  }

  /** Brute-force 3-gram Jaccard over all pairs. */
  private def bruteJaccard(df: DataFrame): Map[(Long, Long), Double] = {
    val sh = MinHashDedup.shingles(df)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (for {
      a <- sh.keys; b <- sh.keys if a < b
      inter = sh(a).intersect(sh(b)).size
      if inter > 0
    } yield (a, b) ->
      inter.toDouble / (sh(a).size + sh(b).size - inter)).toMap
  }

  test("minhash-lsh pairs match brute-force jaccard at threshold 0.5") {
    val got = MinHashDedup.nearDuplicates(corpus, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val expected = bruteJaccard(corpus).filter(_._2 >= 0.5)
    // verification step makes precision exact
    got.keys.foreach { p =>
      assert(expected.contains(p), s"false positive pair $p")
      assert(math.abs(got(p) - expected(p)) < 1e-3)
    }
    // 16 bands × 2 rows: recall at s≥0.5 is ≥ 0.99 per pair; on this
    // corpus every true pair must be found
    assert(got.keySet === expected.keySet,
      s"missed pairs: ${expected.keySet -- got.keySet}")
    assert(got.contains((0L, 1L)), "exact dup must be found")
    assert(got((0L, 1L)) === 1.0)
  }

  test("minhash-lsh on the real corpus: subset of brute force, high recall") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = MinHashDedup.nearDuplicates(docs, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = bruteJaccard(docs).filter(_._2 >= 0.3).keySet
    assert(got.subsetOf(expected), "verified candidates can't be false positives")
    if (expected.nonEmpty) {
      val recall = got.size.toDouble / expected.size
      info(f"recall@0.3 = $recall%.2f over ${expected.size} true pairs")
      assert(recall >= 0.5)
    }
  }

  test("simhash: exact dup hamming 0, near dup small, unrelated large") {
    val sig = SimHash.simhash(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int =
      java.lang.Long.bitCount(sig(a) ^ sig(b))
    assert(ham(0, 1) === 0, "identical docs must collide")
    assert(ham(0, 3) === 0, "simhash is order-insensitive over bags")
    assert(ham(0, 2) <= 16, s"near dup too far: ${ham(0, 2)}")
    assert(ham(0, 4) > 16, s"unrelated too close: ${ham(0, 4)}")

    val pairs = SimHash.nearPairs(corpus, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 0 && p._2 == 1 && p._3 == 0))
    // banding is complete for hamming ≤ 3: every qualifying pair appears
    val all = for {
      a <- sig.keys; b <- sig.keys if a < b && ham(a, b) <= 3
    } yield (a, b)
    assert(pairs.map(p => (p._1, p._2)).toSet === all.toSet)
  }

  test("ann-lsh: high recall vs brute-force top-5, bounded candidate set") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val brute = SimilarityQueries.q45.build(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = AnnLsh.topK(emb, 0L to 9L, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // keysIterator, not keys: Set.map would dedup equal per-query counts
    val hits = brute.keysIterator.map(q =>
      (approx.getOrElse(q, Set.empty) intersect brute(q)).size).sum
    val recall = hits.toDouble / (brute.size * 5)
    info(f"ann recall@5 = $recall%.2f")
    // random near-orthogonal vectors are LSH's worst case; measured 0.90
    // at 16 tables × 4 bits on this corpus
    assert(recall >= 0.7, f"recall too low: $recall%.2f")
  }

  test("ann-ivf: deterministic, recall guard at nprobe/nlist = 8/16") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val brute = SimilarityQueries.q45.build(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val run1 = AnnIvf.topK(emb, 0L to 9L, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val run2 = AnnIvf.topK(emb, 0L to 9L, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(run1.toSeq === run2.toSeq, "IVF must be deterministic")
    val approx = run1.map(t => (t._1, t._3)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits2 = brute.keysIterator.map(q =>
      (approx.getOrElse(q, Set.empty[Long]) intersect brute(q)).size).sum
    val recall2 = hits2.toDouble / (brute.size * 5)
    info(f"ivf recall@5 = $recall2%.2f (probing 8/16 cells)")
    // VERDICT r8 item 8: the recall floor lives in the spec layer so a
    // future quantizer change fails tests, not just the artifact diff.
    // maximin-init Lloyd + nprobe 8/16 (the r11 default -- 6/16
    // measured 0.62 at the 10x decade, SCALE.md r11) measures ~0.8+
    // on this corpus; 0.65 leaves noise headroom without tolerating a
    // real regression (the stride-init trainer measured ~0.5).
    assert(recall2 >= 0.65, f"recall too low: $recall2%.2f")
  }

  test("two-stage quantized probe: exact match at full coarseK, high recall when cut") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // coarseK beyond any candidate count → the int8 pass is a pure
    // filter and the result must EQUAL the single-stage IVF probe
    val full = AnnIvf.topKTwoStage(emb, 0L to 9L, k = 5, coarseK = 100000)
      .collect().toSeq
    val single = AnnIvf.topK(emb, 0L to 9L, k = 5).collect().toSeq
    assert(full === single,
      "uncut two-stage result must equal the single-stage probe")
    // aggressive cut: int8 scores keep ordering well enough that top-5
    // recall vs the uncut probe stays high
    val cut = AnnIvf.topKTwoStage(emb, 0L to 9L, k = 5, coarseK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ref = single.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = ref.keysIterator
      .map(q => (cut.getOrElse(q, Set.empty[Long]) intersect ref(q)).size).sum
    val recall = hits.toDouble / (ref.size * 5)
    info(f"two-stage recall@5 = $recall%.2f (coarseK=20)")
    assert(recall >= 0.8, f"coarse int8 cut lost too much: $recall%.2f")
  }

  test("ivf index: streamed appends land in the partitioned layout and are probeable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val path = tmpDir("ivf-stream-index")
    // batch-write the first half, stream-append the second half
    val centroids = AnnIvf.writeIndex(emb.filter(col("vec_id") < 250),
      path, nlist = 16)
    val tail = emb.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray.toSeq))
    val input = MemoryStream[(Long, Seq[Double])](spark)
    input.addData(tail.toIndexedSeq: _*)
    val q = AnnIvf.appendToIndexStream(
        input.toDF().toDF("vec_id", "embedding"), path,
        tmpDir("ivf-stream-ckpt"), centroids)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val idx = spark.read.parquet(path)
    assert(idx.count() === emb.count(),
      "streamed rows must join the batch-written index")
    // a streamed-in vector must now be findable as a neighbor
    val res = AnnIvf.topKIndexed(spark, path, centroids, Seq(300L), k = 5)
    assert(res.count() === 5)
  }

  test("ivf index: cell-partitioned write, probe reads only nprobe dirs") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val path = tmpDir("ivf-index")
    val centroids = AnnIvf.writeIndex(emb, path, nlist = 16)
    val indexed = AnnIvf.topKIndexed(spark, path, centroids, 0L to 9L,
      k = 5, nprobe = 4)
    // same centroids (deterministic training) → identical result to the
    // in-memory path
    val direct = AnnIvf.topK(emb, 0L to 9L, k = 5, nlist = 16, nprobe = 4)
    assert(indexed.collect().toSeq === direct.collect().toSeq,
      "materialized-index probe must match the in-memory IVF result")
    // structural: the cell filter must prune DIRECTORIES (PartitionFilters
    // on the hive partition column), not rows
    val plan = indexed
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("cell#"),
      s"probe must partition-prune on cell:\n${plan.take(3000)}")
  }

  /** Cross-set brute-force oracle: (batch, corpus) near-dup pairs. */
  private def bruteCross(batchIds: Set[Long], threshold: Double)
      : Set[(Long, Long)] =
    bruteJaccard(corpus).filter(_._2 >= threshold).keySet
      .collect {
        case (a, b) if batchIds(a) && !batchIds(b) => (a, b)
        case (a, b) if batchIds(b) && !batchIds(a) => (b, a)
      }

  test("incremental dedup: probe against index equals brute-force cross pairs") {
    val batchIds = Set(0L, 3L)
    val batch = corpus.filter(col("doc_id").isin(batchIds.toSeq: _*))
    val rest = corpus.filter(!col("doc_id").isin(batchIds.toSeq: _*))
    val path = tmpDir("dedup-idx")
    IncrementalDedup.writeIndex(rest, "t_dedup_idx", path, buckets = 4)
    try {
      val got = IncrementalDedup.probe(batch, rest, "t_dedup_idx", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // 16×2 banding at s ≥ 0.5 → per-pair recall ≥ 0.99; on this planted
      // corpus the probe must find exactly the true cross pairs
      assert(got === bruteCross(batchIds, 0.5),
        s"expected ${bruteCross(batchIds, 0.5)}, got $got")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_dedup_idx_sigs")
      spark.sql("DROP TABLE IF EXISTS t_dedup_idx_buckets")
    }
  }

  test("incremental dedup: bucketed append extends the index") {
    val path = tmpDir("dedup-idx-append")
    val first = corpus.filter(col("doc_id").isin(1L, 4L, 5L))
    val more = corpus.filter(col("doc_id").isin(2L, 6L))
    val batch = corpus.filter(col("doc_id") === 0L)
    IncrementalDedup.writeIndex(first, "t_dedup_app", path, buckets = 4)
    try {
      val indexed = first.union(more)
      val before = IncrementalDedup.probe(batch, indexed, "t_dedup_app", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(before === Set(0L -> 1L),
        s"index without docs 2/6 must only match the exact dup: $before")
      IncrementalDedup.appendToIndex(more, "t_dedup_app", path, buckets = 4)
      val after = IncrementalDedup.probe(batch, indexed, "t_dedup_app", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after === bruteCross(Set(0L), 0.5),
        s"appended docs must become findable: $after")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_dedup_app_sigs")
      spark.sql("DROP TABLE IF EXISTS t_dedup_app_buckets")
    }
  }

  test("incremental dedup: packed b-bit probe A/B — identical verified " +
      "pairs, sig column pruned, signature bytes shrink") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val rest = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val path = tmpDir("dedup-idx-packed")
    IncrementalDedup.writeIndex(rest, "t_dedup_pk", path, buckets = 4)
    try {
      def pairsOf(packed: Boolean): Set[(Long, Long, Double)] =
        IncrementalDedup.probe(batch, rest, "t_dedup_pk", 0.3,
            packed = packed)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = pairsOf(packed = false)
      val pk = pairsOf(packed = true)
      assert(exact.nonEmpty, "corpus must yield cross near-dup pairs")
      // recall A/B: the exact text verify makes precision identical;
      // on this corpus the noisier packed prefilter loses nothing
      assert(pk === exact,
        s"packed probe diverged: missing=${exact -- pk} extra=${pk -- exact}")

      // the packed candidates plan must PRUNE the 32-int sig column
      // from the index-side scan — that pruning IS the 32x read claim
      val shB = MinHashDedup.shingles(batch).localCheckpoint()
      val sigTableB = MinHashDedup.signatures(shB).localCheckpoint()
      def sigsReadSchema(packed: Boolean): String = {
        val plan = IncrementalDedup
          .candidates(shB, sigTableB, "t_dedup_pk", 0.3, packed)
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.executedPlan.toString
        plan.linesIterator.filter(_.contains("t_dedup_pk_sigs"))
          .mkString("\n")
      }
      val packedScan = sigsReadSchema(packed = true)
      assert(packedScan.contains("bsig") && !packedScan.contains("sig:array"),
        s"packed probe must not read the 32-int sig column:\n$packedScan")
      assert(sigsReadSchema(packed = false).contains("sig"),
        "exact probe reads the full signature")

      // measured bytes: per-column compressed sizes from the index's
      // own parquet footers — what each mode's scan actually pulls
      val conf = spark.sparkContext.hadoopConfiguration
      val sigsDir = new org.apache.hadoop.fs.Path(s"$path/sigs")
      val fs = sigsDir.getFileSystem(conf)
      var sigBytes = 0L
      var bsigBytes = 0L
      fs.listStatus(sigsDir).filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(f.getPath, conf))
          try {
            reader.getFooter.getBlocks.forEach { b =>
              b.getColumns.forEach { c =>
                val p = c.getPath.toDotString
                if (p.startsWith("sig.")) sigBytes += c.getTotalSize
                else if (p == "bsig") bsigBytes += c.getTotalSize
              }
            }
          } finally reader.close()
        }
      assert(sigBytes > 0 && bsigBytes > 0)
      info(f"signature column bytes: sig=$sigBytes bsig=$bsigBytes " +
        f"(${sigBytes.toDouble / bsigBytes}%.1fx)")
      // 32 ints vs 1 long is 16x raw; parquet encodings eat some of it —
      // assert a conservative 4x so the test tracks the claim, not codec
      // luck on a tiny corpus
      assert(sigBytes >= 4 * bsigBytes,
        s"expected the packed column to be far smaller: sig=$sigBytes bsig=$bsigBytes")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_dedup_pk_sigs")
      spark.sql("DROP TABLE IF EXISTS t_dedup_pk_buckets")
    }
  }

  test("incremental dedup: band join reads the index bucketed, no corpus-side exchange") {
    val batchIds = Set(0L, 3L)
    val batch = corpus.filter(col("doc_id").isin(batchIds.toSeq: _*))
    val rest = corpus.filter(!col("doc_id").isin(batchIds.toSeq: _*))
    val path = tmpDir("dedup-idx-plan")
    IncrementalDedup.writeIndex(rest, "t_dedup_plan", path, buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // adaptive threshold is unset by default; restore = unset
    val prevA = spark.conf.getOption(
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the band join would OTHERWISE shuffle both
      // sides — proving the bucketed layout (not size) spared the corpus
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val shB = MinHashDedup.shingles(batch).localCheckpoint()
      val sigTableB = MinHashDedup.signatures(shB).localCheckpoint()
      val plan = IncrementalDedup
        .candidates(shB, sigTableB, "t_dedup_plan", 0.5)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"index scan must be bucket-aware:\n${plan.take(3000)}")
      // the probe (batch) side legitimately shuffles to the bucket count;
      // a SECOND bkey exchange would mean the index side re-shuffled too
      val bkeyExchanges = "Exchange hashpartitioning\\(bkey".r
        .findAllIn(plan).size
      assert(bkeyExchanges <= 1,
        s"index side must not re-shuffle on bkey ($bkeyExchanges exchanges):\n${plan.take(3000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevA match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP TABLE IF EXISTS t_dedup_plan_sigs")
      spark.sql("DROP TABLE IF EXISTS t_dedup_plan_buckets")
    }
  }
}
