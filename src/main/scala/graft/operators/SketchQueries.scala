package graft.operators

import Q._

/** Sketch-based operators registered for the driver. q43/q44 carry
  * FULL DuckDB SQL oracles (r17): since the MinHash/SimHash lane hash
  * is the md5-60-bit [[KmvSketch.h60]], every stage — signatures, band
  * keys, candidate mining, prefilter, exact verification — replays in
  * SQL with the same pinned permutation constants, the KMV-q126 /
  * Count-Min-q211 precedent applied to the whole dedup sketch. The
  * remaining rows-only entries (ANN recall tiers, HLL binary, learned
  * codebooks) have their semantic oracles in ScalaTest (SketchSpec).
  */
object SketchQueries {

  /** DuckDB replay of [[MinHashDedup.nearDuplicates]] at τ = 0.5: the
    * shared shingle CTEs, the 32 pinned-permutation min-hash lanes over
    * the md5-60 base hash, the 16 band keys, the band-bucket self-join,
    * the size-ratio + signature-estimate prefilter, and the exact
    * Jaccard verification — stage for stage the Spark plan's algebra.
    */
  private def q43Sql: String = {
    val p = MinHashDedup.P
    val sigCols = MinHashDedup.perms.zipWithIndex.map {
      case ((a, b), i) => s"MIN(($a * h + $b) % $p) AS sig_$i"
    }.mkString(",\n               ")
    val bandArms = (0 until MinHashDedup.Bands).map { bnd =>
      val key = (0 until MinHashDedup.RowsPerBand)
        .map(r => s"CAST(sig_${bnd * MinHashDedup.RowsPerBand + r} " +
          "AS VARCHAR)")
        .mkString(s"'$bnd:' || ", " || ':' || ", "")
      s"SELECT doc_id, ${KmvSketch.h60Sql(key)} AS bkey FROM sigs"
    }.mkString("\n        UNION ALL ")
    val estSum = (0 until MinHashDedup.NumHashes)
      .map(i => s"CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""
      WITH ${DedupQueries.shingleCtesSql},
      hashed AS (
        SELECT doc_id, ${KmvSketch.h60Sql("shingle")} % $p AS h
        FROM shingles),
      sigs AS (
        SELECT doc_id,
               $sigCols
        FROM hashed GROUP BY doc_id),
      bands AS (
        $bandArms),
      cand0 AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
      cand AS (
        SELECT doc_a, doc_b
        FROM cand0
        JOIN sigs sa ON sa.doc_id = cand0.doc_a
        JOIN sigs sb ON sb.doc_id = cand0.doc_b
        JOIN sizes za ON za.doc_id = cand0.doc_a
        JOIN sizes zb ON zb.doc_id = cand0.doc_b
        WHERE GREATEST(za.n_sh, zb.n_sh) * 0.5 <= LEAST(za.n_sh, zb.n_sh)
          AND ($estSum) / 32.0 >= 0.25),
      inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        FROM cand c
        JOIN shingles x ON x.doc_id = c.doc_a
        JOIN shingles y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
        GROUP BY 1, 2),
      verified AS (
        SELECT i.doc_a, i.doc_b,
               round(CAST(n_inter AS DOUBLE) /
                     (za.n_sh + zb.n_sh - n_inter), 4) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.doc_a
        JOIN sizes zb ON zb.doc_id = i.doc_b)
      SELECT doc_a, doc_b, jaccard
      FROM verified WHERE jaccard >= 0.5
      ORDER BY doc_a, doc_b
    """
  }

  val q43 = GraftQuery(
    "q43_minhash_lsh_pairs",
    (s, d) => MinHashDedup.nearDuplicates(t(s, d, "documents"), 0.5),
    Some(q43Sql))

  /** DuckDB replay of [[SimHash.nearPairs]]: per-word tf, the md5-60
    * word hash, the 60 weighted bit-sums packed into the fingerprint,
    * 4×15-bit chunk banding, and the Hamming ≤ 3 filter.
    */
  private def q44Sql: String = {
    val packed = (0 until SimHash.Bits).map { j =>
      s"CASE WHEN SUM(CASE WHEN (h >> $j) & 1 = 1 THEN tf ELSE -tf END)" +
        s" > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("\n               + ")
    s"""
      WITH docs AS (
        SELECT doc_id,
               string_split(
                 ${graft.functions.MockScorers.normalizeSql("text")},
                 ' ') AS words
        FROM documents),
      words AS (
        SELECT doc_id, w, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS w FROM docs)
        WHERE w <> '' GROUP BY 1, 2),
      hashed AS (
        SELECT doc_id, tf, ${KmvSketch.h60Sql("w")} AS h FROM words),
      sims AS (
        SELECT doc_id,
               $packed AS simhash
        FROM hashed GROUP BY doc_id),
      chunks AS (
        SELECT doc_id, simhash, k, (simhash >> (k * 15)) & 32767 AS chunk
        FROM sims, (SELECT unnest([0, 1, 2, 3]) AS k))
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
               AS hamming
      FROM chunks a JOIN chunks b
        ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY doc_a, doc_b
    """
  }

  val q44 = GraftQuery(
    "q44_simhash_pairs",
    (s, d) => SimHash.nearPairs(t(s, d, "documents"), maxHamming = 3),
    Some(q44Sql))

  /** No-oracle: recall-tier ANN — the output is a nearest-neighbor
    * SHORTLIST whose contract is recall@k against brute force (an
    * inequality, not an equation); the driver gate's hash-compare has
    * no way to express "≥ 0.9 of the true top-5", so the oracle is
    * SketchSpec's measured recall plus the BENCH `ann_recall` tier.
    */
  val q52 = GraftQuery(
    "q52_ann_lsh_topk",
    (s, d) => AnnLsh.topK(t(s, d, "embeddings"), 0L to 9L, k = 5),
    None)

  /** Multimodal decode/feature plumbing over binary payloads (stub codec,
    * real batch shape). TOLERANCE-BANDED oracle (r17, VERDICT r16
    * stretch 9, the q34/q75 pattern): the stub codec's dimensions are
    * payload-hash-derived and not SQL-expressible, but the BYTE
    * accounting is exact on both engines (Spark `octet_length` of the
    * UTF-8 payload ≡ DuckDB `strlen`), and the decode invariants —
    * dims inside the stub's documented 16..31 range, 3 channels, mean
    * intensity and every 8×8 thumbnail cell inside [0, 255] — are
    * integer-exact booleans over the REAL extractFeatures output that
    * the oracle pins TRUE. A broken decode path (wrong dims, NaN
    * means, short thumbnails) now fails the driver gate, not just
    * MultimodalSpec; the full feature values stay spec-verified there.
    */
  val q53 = GraftQuery(
    "q53_multimodal_features",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val media = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(media)
        .toDF()
        .select(col("doc_id"), col("n_bytes"),
          (col("width").between(16, 31) && col("height").between(16, 31))
            .as("dims_ok"),
          (col("channels") === 3).as("channels_ok"),
          (col("mean_intensity") >= 0 && col("mean_intensity") <= 255)
            .as("mean_ok"),
          (size(col("thumb_8x8")) === 64 &&
            forall(col("thumb_8x8"), c => c >= 0 && c <= 255))
            .as("thumb_ok"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
             TRUE AS dims_ok, TRUE AS channels_ok,
             TRUE AS mean_ok, TRUE AS thumb_ok
      FROM documents
      ORDER BY doc_id
    """))

  /** IVF-partitioned ANN (the nprobe/nlist scale path next to sign-LSH
    * q52). Rows-only; recall oracle in SketchSpec.
    * No-oracle: recall-tier ANN — k-means cell assignment depends on
    * float-sum reduction order (legitimately non-deterministic across
    * engines), and the contract is recall@k, an inequality the
    * hash-compare gate cannot express (see q52).
    */
  val q55 = GraftQuery(
    "q55_ann_ivf_topk",
    (s, d) => AnnIvf.topK(t(s, d, "embeddings"), 0L to 9L, k = 5),
    None)

  /** Incremental MinHash dedup against a MATERIALIZED corpus index
    * ([[IncrementalDedup]]), split into its two cost regimes so the bench
    * tracks them separately: the index BUILD amortizes over the corpus
    * lifetime, while the PROBE is the steady-state per-batch cost — the
    * number that matters at 100 TB. (Round 3 charged a full rebuild to
    * every probe run, hiding probe-cost regressions.) Rows-only; the
    * exact-equality/recall oracle vs brute force is in SketchSpec, and
    * q71 is the exact SQL-checked face of the same shape.
    */
  private def q72Corpus(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.functions._
    val docs = t(s, d, "documents")
    (docs.filter(pmod(col("doc_id"), lit(10)) === 0),
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 0))
  }

  /** Table name + path are tagged per data dir: one session may verify
    * sf0.01 and bench sf0.1 — a shared catalog name would silently probe
    * the other scale's index. Fixed location per dir, overwritten per
    * build, so repeated runs don't accumulate orphaned copies.
    */
  private def q72Index(d: String): (String, String) = {
    // v2: bkey became the md5-60 band hash (r17) — the version suffix
    // retires any on-disk index built with the old xxhash64 keys, which
    // a probe would otherwise silently miss against.
    val tag = "v2" + java.lang.Integer.toHexString(d.hashCode)
    (s"graft_dedup_idx_$tag",
      s"${sys.props("java.io.tmpdir")}/graft-q72-idx-$tag")
  }

  /** Shared CTE block replaying the MinHash signature + band pipeline
    * (the q43 algebra, same pinned constants) over `rel`, ending in
    * `bands(doc_id, bkey)` — the SQL twin of
    * [[MinHashDedup.bandBuckets]]∘[[MinHashDedup.signatures]], spliced
    * into the q72a/q72b oracles (r18, VERDICT r17 item 3: the index
    * build/probe outputs are deterministic frames a DuckDB CTE replays
    * the same way q71/q43 do).
    */
  private def bandCtesSqlFrom(rel: String): String = {
    val p = MinHashDedup.P
    val sigCols = MinHashDedup.perms.zipWithIndex.map {
      case ((a, b), i) => s"MIN(($a * h + $b) % $p) AS sig_$i"
    }.mkString(",\n               ")
    val bandArms = (0 until MinHashDedup.Bands).map { bnd =>
      val key = (0 until MinHashDedup.RowsPerBand)
        .map(r => s"CAST(sig_${bnd * MinHashDedup.RowsPerBand + r} " +
          "AS VARCHAR)")
        .mkString(s"'$bnd:' || ", " || ':' || ", "")
      s"SELECT doc_id, ${KmvSketch.h60Sql(key)} AS bkey FROM sigs"
    }.mkString("\n        UNION ALL ")
    s"""${DedupQueries.shingleCtesSqlFrom(rel)},
      hashed AS (
        SELECT doc_id, ${KmvSketch.h60Sql("shingle")} % $p AS h
        FROM shingles),
      sigs AS (
        SELECT doc_id,
               $sigCols
        FROM hashed GROUP BY doc_id),
      bands AS (
        $bandArms)"""
  }

  val q72a = GraftQuery(
    "q72a_index_build", {
      import org.apache.spark.sql.functions._
      (s, d) => {
        val (_, corpus) = q72Corpus(s, d)
        val (table, path) = q72Index(d)
        IncrementalDedup.writeIndex(corpus, table, path)
        // deterministic build summary (hash-exact vs the oracle's CTE
        // replay of the same signature/band pipeline)
        s.table(s"${table}_buckets")
          .agg(count(lit(1)).as("index_entries"),
            countDistinct(col("bkey")).as("distinct_buckets"))
      }
    },
    Some(s"""
      WITH ${bandCtesSqlFrom(
        "(SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0) corp")}
      SELECT COUNT(*) AS index_entries,
             COUNT(DISTINCT bkey) AS distinct_buckets
      FROM bands
    """))

  /** DuckDB replay of [[IncrementalDedup.probe]] at τ = 0.3: signatures
    * and bands over ALL documents, the band join restricted to
    * batch-side (doc_id % 10 = 0) vs corpus-side rows, the size-ratio +
    * signature-estimate prefilter, and the exact Jaccard verify —
    * stage for stage the probe's algebra (the index tables hold exactly
    * the corpus rows of these frames, so reading them vs recomputing is
    * observationally identical). Double-typed literals are CAST so
    * DuckDB multiplies in IEEE doubles like Spark, not in decimals
    * (10 · 0.3 is 3.0000000000000004 in binary — a decimal 3.0 would
    * flip the boundary).
    */
  private def q72bSql: String = {
    val estSum = (0 until MinHashDedup.NumHashes)
      .map(i => s"CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""
      WITH ${bandCtesSqlFrom("documents")},
      cand0 AS (
        SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS corpus_doc
        FROM bands a JOIN bands b ON a.bkey = b.bkey
        WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
      cand AS (
        SELECT batch_doc, corpus_doc
        FROM cand0
        JOIN sigs sa ON sa.doc_id = cand0.batch_doc
        JOIN sigs sb ON sb.doc_id = cand0.corpus_doc
        JOIN sizes za ON za.doc_id = cand0.batch_doc
        JOIN sizes zb ON zb.doc_id = cand0.corpus_doc
        WHERE GREATEST(za.n_sh, zb.n_sh) * CAST(0.3 AS DOUBLE)
                <= LEAST(za.n_sh, zb.n_sh)
          AND ($estSum) / 32.0
                >= (CAST(0.3 AS DOUBLE) - CAST(0.25 AS DOUBLE))),
      inter AS (
        SELECT c.batch_doc, c.corpus_doc, COUNT(*) AS n_inter
        FROM cand c
        JOIN shingles x ON x.doc_id = c.batch_doc
        JOIN shingles y ON y.doc_id = c.corpus_doc
          AND y.shingle = x.shingle
        GROUP BY 1, 2),
      verified AS (
        SELECT i.batch_doc, i.corpus_doc,
               round(CAST(n_inter AS DOUBLE) /
                     (za.n_sh + zb.n_sh - n_inter), 4) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.batch_doc
        JOIN sizes zb ON zb.doc_id = i.corpus_doc)
      SELECT batch_doc, corpus_doc, jaccard
      FROM verified WHERE jaccard >= CAST(0.3 AS DOUBLE)
      ORDER BY batch_doc, corpus_doc
    """
  }

  val q72b = GraftQuery(
    "q72b_probe", {
      (s, d) => {
        val (batch, corpus) = q72Corpus(s, d)
        val (table, path) = q72Index(d)
        // Steady state: the index already exists (built by q72a or a
        // prior run) and the probe never touches corpus signatures.
        // Build only when genuinely absent so the entry stays runnable
        // standalone; under the bench's min-of-N repeat the later
        // iterations measure the pure probe either way.
        if (!IncrementalDedup.ensureRegistered(s, table, path, 32))
          IncrementalDedup.writeIndex(corpus, table, path)
        IncrementalDedup.probe(batch, corpus, table, 0.3)
      }
    },
    Some(q72bSql))

  /** Approximate percentiles (Greenwald–Khanna via Spark's
    * `approx_percentile`) — the at-scale quantile path: one pass,
    * mergeable per-partition sketches, bounded memory, vs q39's exact
    * `percentile` which buffers each group's values. TOLERANCE-BANDED
    * oracle (r16, VERDICT r15 stretch 9): the sketch VALUES are
    * engine-specific, but GK guarantees rank error ≤ ε·n (ε = 1/10000
    * at accuracy 10000) — so the hashed output is the per-group count
    * plus integer-exact booleans asserting the returned quantiles'
    * RANKS (rows ≤ value, measured by a join back against the data)
    * sit within that guarantee (+1 slack for value multiplicity);
    * the oracle pins them TRUE. A broken sketch path now fails the
    * driver gate, not just AdvancedSpec.
    */
  val q75 = GraftQuery(
    "q75_approx_percentiles", {
      import org.apache.spark.sql.functions._
      (s, d) => {
        val orders = t(s, d, "orders")
        val approx = orders
          .groupBy(col("o_orderpriority"))
          .agg(
            expr("approx_percentile(o_totalprice, array(0.5, 0.95), 10000)")
              .as("approx_p"))
          .select(col("o_orderpriority"),
            col("approx_p").getItem(0).as("p50"),
            col("approx_p").getItem(1).as("p95"))
        orders.join(broadcast(approx), "o_orderpriority")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_totalprice") <= col("p50"), 1L)
              .otherwise(0L)).as("r50"),
            sum(when(col("o_totalprice") <= col("p95"), 1L)
              .otherwise(0L)).as("r95"))
          .select(col("o_orderpriority"), col("n"),
            // |r50 − n/2| ≤ n·ε + 1  ⇔  |2·r50 − n| ≤ 2·(n div 10000 + 1)
            (abs(col("r50") * 2 - col("n"))
              <= (expr("n div 10000") + 1) * 2).as("p50_rank_ok"),
            // |r95 − 0.95·n| ≤ n·ε + 1 ⇔ |20·r95 − 19·n| ≤ 20·(n div 10000 + 1)
            (abs(col("r95") * 20 - col("n") * 19)
              <= (expr("n div 10000") + 1) * 20).as("p95_rank_ok"))
          .orderBy(col("o_orderpriority"))
      }
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
             TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
      FROM orders GROUP BY 1 ORDER BY 1
    """))

  /** Bloom span pre-filter ([[BloomDedup]]): corpus 20-word-block
    * fingerprints sketched at ~1% FPP, batch blocks probed inside
    * codegen, per-doc maybe-dup counts. The "definitely new" fast path
    * in front of q72's exact probe. HASH-EXACT oracle (r18, VERDICT
    * r17 item 3): the md5-60 double-hashing bloom's bit pattern —
    * false positives included — is fully determined by the pinned lane
    * arithmetic, so the oracle rebuilds the SAME filter as a distinct
    * bit-position set and replays every probe lane in SQL. The
    * no-false-negative and FPR-band properties stay spec'd in
    * BloomDedupSpec.
    */
  private def q85Sql: String = {
    import graft.functions.MockScorers.normalizeSql
    val laneList = (0 until BloomDedup.K).mkString("[", ", ", "]")
    s"""
      WITH docs AS (
        SELECT doc_id, string_split(${normalizeSql("text")}, ' ') AS words
        FROM documents),
      expanded AS (
        SELECT doc_id, words,
               unnest(generate_series(0,
                 CAST(len(words) // 20 AS INTEGER) - 1)) AS bi
        FROM docs WHERE len(words) >= 20),
      inst AS (
        SELECT doc_id, bi,
               ${KmvSketch.h60Sql(
                 "array_to_string(words[bi*20+1 : bi*20+20], ' ')")} AS fp
        FROM expanded),
      nm AS (
        SELECT ((((COUNT(*) * 96) // 10 + 1) + 63) // 64) * 64 AS m
        FROM inst WHERE doc_id % 10 <> 0),
      lanes AS (SELECT unnest($laneList) AS lane),
      cpos AS (
        SELECT DISTINCT ${BloomDedup.posSql("i.fp", "lane", "m")} AS pos
        FROM inst i CROSS JOIN nm CROSS JOIN lanes
        WHERE i.doc_id % 10 <> 0),
      probe AS (
        SELECT i.doc_id, i.bi,
               ${BloomDedup.posSql("i.fp", "lane", "m")} AS pos
        FROM inst i CROSS JOIN nm CROSS JOIN lanes
        WHERE i.doc_id % 10 = 0),
      blockhit AS (
        SELECT p.doc_id, p.bi,
               COUNT(c.pos) = ${BloomDedup.K} AS hit
        FROM probe p LEFT JOIN cpos c ON c.pos = p.pos
        GROUP BY 1, 2)
      SELECT doc_id, COUNT(*) AS n_blocks,
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_maybe_dup
      FROM blockhit
      GROUP BY doc_id
      ORDER BY doc_id
    """
  }

  val q85 = GraftQuery(
    "q85_bloom_prefilter", {
      import org.apache.spark.sql.functions._
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val corpus = SpanDedup.blocks(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), blockWords = 20)
          .select(KmvSketch.h60(col("block")).as("fp"))
        val bloom = BloomDedup.build(corpus, "fp",
          expectedItems = corpus.count())
        SpanDedup.blocks(
          docs.filter(pmod(col("doc_id"), lit(10)) === 0), blockWords = 20)
          .withColumn("hit",
            BloomDedup.mightContain(bloom, KmvSketch.h60(col("block"))))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_blocks"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_maybe_dup"))
          .orderBy(col("doc_id"))
      }
    },
    Some(q85Sql))

  /** Heavy hitters, sketch-gated but EXACT — and therefore fully
    * SQL-oracled, unlike the rest of this file: tokens occurring ≥
    * total/200 times. Pass 1 folds the stream into one fixed-size
    * count-min sketch (built-in `count_min_sketch` aggregate —
    * mergeable, partial-final, ~100 KB regardless of corpus size);
    * pass 2 re-streams tokens through the codegen'd
    * [[graft.functions.expressions.CmsHeavyGate]] (no false negatives
    * — CMS only overestimates) so ONLY candidate rows reach the exact
    * group-by, whose result is then exactly filtered. At 100 TB the
    * win is the shuffle: a plain heavy-hitter group-by moves every
    * token; this moves the sketch (once) plus the heavy candidates (a
    * vanishing fraction at any real threshold). Over-threshold light
    * tokens admitted by overestimation cost shuffle bytes, never
    * correctness — the final HAVING is exact.
    */
  val q91 = GraftQuery(
    "q91_heavy_hitters", {
      import org.apache.spark.sql.functions._
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val threshold = toks.count() / 200
        val sketchBytes = toks
          .agg(count_min_sketch(col("tok"), lit(0.001), lit(0.99), lit(42)))
          .head().getAs[Array[Byte]](0)
        toks
          .filter(graft.functions.expressions.CmsHeavyGate(col("tok"),
            sketchBytes, threshold))
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= threshold)
          .orderBy(col("n").desc, col("tok"))
      }
    },
    Some("""
      WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      t2 AS (SELECT tok FROM toks WHERE tok <> '')
      SELECT tok, COUNT(*) AS n
      FROM t2
      GROUP BY tok
      HAVING COUNT(*) >= (SELECT COUNT(*) // 200 FROM t2)
      ORDER BY n DESC, tok
    """))

  /** MERGEABLE cardinality tier (DataSketches HLL, built-in): per-source
    * distinct-token sketches plus a `__all__` row whose estimate comes
    * from UNIONING the stored sketches — never re-scanning the corpus.
    * This is the property q34's `approx_count_distinct` lacks (its HLL±±
    * state is agg-internal): here the sketch is a first-class binary
    * column a pipeline persists per shard/day, so "distinct tokens
    * corpus-wide" is a union over stored KBs — the incremental-audit
    * shape at 100 TB (one corpus pass ever, re-aggregation is
    * sketch-sized). Rows-only; relative-error and union-consistency
    * bounds are asserted in CmsHeavySpec's sibling tests.
    * No-oracle: the output estimates come out of DataSketches' HLL
    * binary representation (engine-private hashing + register layout);
    * DuckDB's approx_count_distinct is a different sketch with
    * different estimates, so no SQL reproduces these values.
    */
  val q92 = GraftQuery(
    "q92_hll_mergeable", {
      import org.apache.spark.sql.functions._
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("source"),
            explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val perSource = toks.groupBy(col("source"))
          .agg(hll_sketch_agg(col("tok"), 12).as("sk"))
        val bySource = perSource
          .select(col("source"), hll_sketch_estimate(col("sk")).as("est"))
        val union = perSource
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("est"))
          .select(lit("__all__").as("source"), col("est"))
        bySource.unionByName(union).orderBy(col("source"))
      }
    },
    None)

  /** b-bit MinHash near-dup probe ([[BbitMinHash]], X67): the q43 band
    * mining with the verify step reading ONE packed 64-bit word per doc
    * instead of 32 signature longs. HASH-EXACT oracle (r18, VERDICT r17
    * item 3): a matching 2-bit lane is exactly `sig_i % 4` equality on
    * the md5-60 signatures, and the Li–König estimate
    * (c − 0.25) / 0.75 is one fixed double tree over dyadic-exact
    * leaves (k/32, 0.25, 0.75 are all powers-of-two rationals), so the
    * SQL replays the packed-word arithmetic without packing. The
    * estimator-bias oracle stays in BbitMinHashSpec.
    */
  private def q118Sql: String = {
    val laneSum = (0 until MinHashDedup.NumHashes)
      .map(i => s"CASE WHEN sa.sig_$i % 4 = sb.sig_$i % 4 " +
        "THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""
      WITH ${bandCtesSqlFrom("documents")},
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
      lanes AS (
        SELECT c.doc_a, c.doc_b,
               CAST($laneSum AS INTEGER) AS lanes_match
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.doc_a
        JOIN sigs sb ON sb.doc_id = c.doc_b),
      est AS (
        SELECT doc_a, doc_b, lanes_match,
               round(((CAST(lanes_match AS DOUBLE) / 32.0) - 0.25)
                 / 0.75, 6) AS j_est
        FROM lanes)
      SELECT doc_a, doc_b, lanes_match, j_est
      FROM est WHERE j_est >= CAST(0.4 AS DOUBLE)
      ORDER BY doc_a, doc_b
    """
  }

  val q118 = GraftQuery(
    "q118_bbit_minhash",
    (s, d) => BbitMinHash.nearDuplicates(t(s, d, "documents"), 0.4),
    Some(q118Sql))

  /** PQ-coded ANN ([[PqAnn]], X76): 64-dim float vector → ONE packed
    * 32-bit code (64× compression), queries answered by ADC lookup
    * tables over the code column — the exhaustive-rescan-viable member
    * of the ANN ladder. Rows-only (learned codebooks); recall oracle in
    * PqAnnSpec, tracked as `pq_at5` in the bench artifact.
    * No-oracle: recall-tier ANN with LEARNED k-means codebooks —
    * float-sum reduction order makes the codebook engine-specific, and
    * the contract is recall@k, an inequality the hash gate cannot
    * express (see q52).
    */
  val q127 = GraftQuery(
    "q127_ann_pq_topk",
    (s, d) => PqAnn.topK(t(s, d, "embeddings"), 0L to 9L, k = 5),
    None)

  /** IVFADC — the composed IVF∘PQ production index ([[IvfPq]], X80):
    * cell pruning × code compression, residual-encoded. Rows-only;
    * recall oracle in IvfPqSpec, tracked as `ivfpq_at5` in BENCH.
    * No-oracle: recall-tier ANN with learned coarse + residual
    * codebooks (see q127/q52 — engine-specific float training, and a
    * recall@k contract the hash gate cannot express).
    */
  val q131 = GraftQuery(
    "q131_ann_ivfpq_topk",
    (s, d) => IvfPq.topK(t(s, d, "embeddings"), 0L to 9L, k = 5),
    None)

  val all: Seq[GraftQuery] =
    Seq(q43, q44, q52, q53, q55, q72a, q72b, q75, q85, q91, q92, q118, q127,
      q131)
}
