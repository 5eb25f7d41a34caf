package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** Similarity search over the embedding column (north-star X16).
  *
  * q45 is the exact brute-force baseline: query set broadcast against the
  * corpus, cosine via sequential left-fold dot products (identical
  * float64 op order in Spark's `aggregate` and DuckDB's `list_reduce`, so
  * the scores hash-match exactly). The LSH-bucketed scale path lives in
  * [[graft.operators.SketchSimilarity]] (ScalaTest recall oracle).
  *
  * At scale: the corpus stays partitioned, only the k query vectors move
  * (broadcast); top-k per query is a partial top-k then merge (window over
  * qid after a shuffle of ≤ corpus rows × |Q| candidate rows — for large
  * |Q| switch to the LSH variant).
  */
object SimilarityQueries {

  /** Native fused-loop dot product (graft.functions.expressions.DotProduct)
    * — bit-identical to the sequential fold and to DuckDB's list_reduce.
    */
  private def dot(a: String, b: String) =
    graft.functions.expressions.VectorFunctions.dot(col(a), col(b))

  private def sqNorm(a: String) =
    graft.functions.expressions.VectorFunctions.sqNorm(col(a))

  /** Exact top-5 cosine neighbors for query vectors vec_id < 10. */
  val q45 = GraftQuery(
    "q45_knn_bruteforce",
    (s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm", sqrt(sqNorm("emb")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("emb").as("qemb"),
          col("nrm").as("qnrm"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("vec_id"))
      e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("cosine",
          dot("qemb", "emb") / (col("qnrm") * col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cosine"), 6).as("cosine_r"))
        .orderBy(col("qid"), col("rank"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding::DOUBLE[], x -> x * x)),
                 (acc, v) -> acc + v)) AS nrm
        FROM embeddings),
      q AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm
            FROM e WHERE vec_id < 10),
      scored AS (
        SELECT q.qid, e.vec_id,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(q.qemb, (x, i) -> x * e.emb[i])),
                 (acc, v) -> acc + v) / (q.qnrm * e.nrm) AS cosine
        FROM e CROSS JOIN q
        WHERE e.vec_id <> q.qid),
      ranked AS (
        SELECT qid, vec_id,
               cosine,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id,
             round(cosine, 6) AS cosine_r
      FROM ranked
      WHERE rank <= 5
      ORDER BY qid, rank
    """))

  /** Per-label centroid similarity structure: average pairwise cosine
    * within each label vs the global average — an aggregate over the same
    * exact dot-product kernel, exercising agg-over-join at similarity
    * scale. Restricted to vec_id < 200 to bound the pair count.
    */
  val q46 = GraftQuery(
    "q46_label_cohesion",
    (s, d) => {
      val e = t(s, d, "embeddings")
        .filter(col("vec_id") < 200)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm", sqrt(sqNorm("emb")))
      val a = e.select(col("vec_id").as("ia"), col("label").as("la"),
        col("emb").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("ib"), col("label").as("lb"),
        col("emb").as("eb"), col("nrm").as("nb"))
      a.join(b, col("ia") < col("ib"))
        .withColumn("cosine", dot("ea", "eb") / (col("na") * col("nb")))
        .groupBy((col("la") === col("lb")).as("same_label"))
        .agg(count(lit(1)).as("n_pairs"),
          // exact decimal sum of rounded cosines: avg of raw doubles would
          // depend on partition/accumulation order
          round(sum(round(col("cosine"), 6)
            .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
            .cast("double") / count(lit(1)), 6).as("avg_cosine"),
          round(max(col("cosine")), 6).as("max_cosine"))
        .orderBy(col("same_label"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding::DOUBLE[], x -> x * x)),
                 (acc, v) -> acc + v)) AS nrm
        FROM embeddings WHERE vec_id < 200),
      pairs AS (
        SELECT a.label = b.label AS same_label,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(a.emb, (x, i) -> x * b.emb[i])),
                 (acc, v) -> acc + v) / (a.nrm * b.nrm) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT same_label, COUNT(*) AS n_pairs,
             round(CAST(SUM(CAST(round(cosine, 6) AS DECIMAL(20,6))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_cosine,
             round(MAX(cosine), 6) AS max_cosine
      FROM pairs
      GROUP BY 1
      ORDER BY same_label
    """))

  /** Int8 quantization fidelity (X16 storage path, [[Quantize]]): the
    * per-vector scale and the max round-trip error — both engines follow
    * the identical float path (max is order-exact; scale division and
    * round are the same IEEE ops), so the oracle hash-matches despite
    * being float-valued.
    */
  val q65 = GraftQuery(
    "q65_quantize_fidelity",
    (s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("emb"))
        .withColumn("__scale", Quantize.scaleOf(col("emb")))
        .withColumn("qs", Quantize.quantizeWith(col("emb"), col("__scale")))
        .withColumn("deq", Quantize.dequantize(col("qs")))
      e.select(col("vec_id"),
        round(col("qs").getField("scale"), 9).as("scale_r"),
        round(array_max(zip_with(col("emb"), col("deq"),
          (x, y) => abs(x - y))), 9).as("max_err"))
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      q AS (
        SELECT vec_id, emb,
               list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
        FROM e)
      SELECT vec_id, round(scale, 9) AS scale_r,
             CASE WHEN scale = 0 THEN 0.0
                  ELSE round(list_max(list_transform(emb,
                    x -> abs(x - round(x / scale) * scale))), 9)
             END AS max_err
      FROM q
      ORDER BY vec_id
    """))

  /** Corpus-scale embedding near-dup mining ([[AnnLsh.nearPairs]] — the
    * at-scale counterpart of q54's bounded exact face): LSH buckets mine
    * candidate pairs by self-join, exact cosine verifies. The corpus is
    * unioned with a half-scaled copy of itself (ids offset by 1e6) — the
    * planted-duplicate harness a re-crawled-shard dedup run looks like.
    * Scaling by 0.5 is exact in IEEE arithmetic and leaves every sign
    * projection unchanged, so each planted pair collides in ALL bucket
    * tables (recall exactly 1 by construction) with cosine exactly 1;
    * the synthetic corpus has no natural pair near the 0.9 threshold
    * (max pairwise cosine ≈ 0.55 at sf0.01), so the LSH output equals
    * the exact all-pairs oracle and the query is hash-checkable despite
    * being approximate in general. General-corpus recall (clusters,
    * closure) is asserted in AnnNearPairsSpec.
    */
  val q76 = GraftQuery(
    "q76_embedding_near_pairs",
    (s, d) => {
      val base = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val planted = base.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5d)).as("embedding"))
      AnnLsh.nearPairs(base.union(planted), minCos = 0.9)
    },
    Some("""
      WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      u AS (
        SELECT vec_id, emb FROM base
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(emb, x -> x * 0.5) AS emb
        FROM base),
      e AS (
        SELECT vec_id, emb,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(emb, x -> x * x)),
                 (acc, v) -> acc + v)) AS nrm
        FROM u)
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(a.emb, (x, i) -> x * b.emb[i])),
               (acc, v) -> acc + v) / (a.nrm * b.nrm), 6) AS cosine_r
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(a.emb, (x, i) -> x * b.emb[i])),
              (acc, v) -> acc + v) / (a.nrm * b.nrm) >= 0.9
      ORDER BY ia, ib
    """))

  /** Mirrorable uniform[-1,1] JL plane matrix, row-major: entry x =
    * j·dim+i is (((x·1103515245 + 12345) mod 2001) − 1000)/1000 — the
    * repo's LCG discipline so the q89 oracle can regenerate it in SQL.
    * (Uniform planes satisfy JL like Gaussians — Achlioptas 2003 —
    * with variance 1/3, so |Pv|²·3/k estimates |v|².)
    */
  private[operators] def jlPlanes(k: Int, dim: Int): Array[Double] =
    Array.tabulate(k * dim)(x =>
      (((x * 1103515245L + 12345L) % 2001L) - 1000L) / 1000.0)

  /** Random projection 64→16 dims ([[graft.functions.expressions.RandomProject]])
    * — the storage/index-shrinking step of the similarity tier (4×
    * smaller vectors for ANN candidate generation; exact rerank stays
    * on the originals, the q55 two-stage pattern). Map-only pass, no
    * shuffle; the oracle checks the first four projected coordinates
    * bit-exactly (same fold order in both engines), the spec covers
    * all 16 plus the JL distance-preservation property.
    */
  val q89 = GraftQuery(
    "q89_random_projection",
    (s, d) => {
      val (k, dim) = (16, 64)
      t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .select(col("vec_id"),
          graft.functions.expressions.VectorFunctions
            .randomProject(col("emb"), jlPlanes(k, dim), k, dim).as("p"))
        .select(Seq(col("vec_id")) ++ (0 until 4).map(j =>
          round(element_at(col("p"), j + 1), 6).as(s"p$j")): _*)
        .orderBy(col("vec_id"))
    },
    Some {
      def proj(j: Int) =
        s"""round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(emb, (x, i) ->
                 x * ((CAST($j * 64 + (i - 1) AS BIGINT) * 1103515245
                       + 12345) % 2001 - 1000) / 1000.0)),
               (acc, v) -> acc + v), 6) AS p$j"""
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
      SELECT vec_id,
             ${(0 until 4).map(proj).mkString(",\n             ")}
      FROM e
      ORDER BY vec_id
    """
    })

  /** Semantic dedup, the SemDeDup composition ([[SemanticDedup]], X53):
    * unit-normalize → coarse centroid cell (the q55/q65 LCG-matrix
    * discipline, so the oracle regenerates the centroids in SQL) →
    * within-cell cosine pairs → transitive closure → keep the group
    * member farthest from its centroid. The corpus is unioned with a
    * half-scaled copy (q76's planted harness): scaling by 0.5 is exact
    * and unit-normalization cancels it bit-for-bit, so every planted
    * pair lands in its original's cell with cosine exactly 1 and the
    * output is hash-checkable end to end — cells, closure, and keep
    * rule all exercised. minCos = 0.5 sits below the corpus's natural
    * max pairwise cosine, so natural same-cell pairs participate too.
    */
  val q100 = GraftQuery(
    "q100_semantic_dedup",
    (s, d) => {
      val (cells, dim) = (8, 64)
      val base = t(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      // the planted-id band must be disjoint or prune's join on id
      // silently fans out — and the oracle, applying the same offset,
      // would hash-match the corruption; fail loudly instead (one
      // tiny agg job on an already-eager query)
      val maxRow = base.agg(max(col("vec_id"))).head()
      // max over an empty table is NULL: empty is trivially
      // collision-free, not an NPE
      val maxId = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)
      require(maxId < 1000000L,
        s"planted-id offset collides: max vec_id $maxId >= 1000000")
      val planted = base.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5d)).as("embedding"))
      SemanticDedup.prune(base.union(planted), jlPlanes(cells, dim),
        cells, dim, minCos = 0.5)
    },
    Some("""
      WITH RECURSIVE base AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      uall AS (
        SELECT vec_id, emb FROM base
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(emb, x -> x * 0.5) AS emb
        FROM base),
      nz AS (
        -- zero-norm guard matching BOTH Spark faces: the k-means
        -- training frame filters nrm > 0, and prune itself excludes
        -- zero-norm rows before assignment (SemanticDedup.scala:91)
        SELECT vec_id, emb FROM uall
        WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(emb, y -> y * y)), (acc, v) -> acc + v) > 0),
      u AS (
        SELECT vec_id,
               list_transform(emb, x -> x /
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(emb, y -> y * y)),
                   (acc, v) -> acc + v))) AS unit
        FROM nz),
      cellscore AS (
        SELECT u.vec_id, CAST(c.cell AS INTEGER) AS cell,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(u.unit, (x, i) ->
                   (x - ((CAST(c.cell * 64 + (i - 1) AS BIGINT) * 1103515245
                          + 12345) % 2001 - 1000) / 1000.0)
                   * (x - ((CAST(c.cell * 64 + (i - 1) AS BIGINT) * 1103515245
                            + 12345) % 2001 - 1000) / 1000.0))),
                 (acc, v) -> acc + v) AS d
        FROM u CROSS JOIN range(8) AS c(cell)),
      assigned AS (
        SELECT vec_id, cell, d AS cdist
        FROM (SELECT vec_id, cell, d,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d, cell) AS rk
              FROM cellscore)
        WHERE rk = 1),
      pairs AS (
        SELECT x.vec_id AS ia, y.vec_id AS ib
        FROM assigned x
        JOIN assigned y ON x.cell = y.cell AND x.vec_id < y.vec_id
        JOIN u ux ON ux.vec_id = x.vec_id
        JOIN u uy ON uy.vec_id = y.vec_id
        WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(ux.unit, (x, i) -> x * uy.unit[i])),
                (acc, v) -> acc + v) >= 0.5),
      nodes AS (
        SELECT ia AS id FROM pairs UNION SELECT ib FROM pairs),
      edges AS (
        SELECT ia AS src, ib AS dst FROM pairs
        UNION ALL
        SELECT ib, ia FROM pairs),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src),
      comp AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY 1),
      sized AS (
        SELECT group_id, COUNT(*) AS group_size FROM comp GROUP BY 1)
      SELECT c.id AS vec_id, a.cell, c.group_id, s.group_size,
             round(a.cdist, 6) AS cdist_r,
             ROW_NUMBER() OVER (PARTITION BY c.group_id
                                ORDER BY a.cdist DESC, c.id) = 1 AS kept
      FROM comp c
      JOIN sized s USING (group_id)
      JOIN assigned a ON a.vec_id = c.id
      ORDER BY vec_id
    """))

  /** D4 prototype diversification ([[PrototypeDiversify]], X63): drop
    * the ⌈25 %⌉ of each centroid cell nearest its centroid — the
    * SSL-prototypes rule that follows SemDeDup in the D4 pipeline. The
    * oracle regenerates the LCG plane centroids and replays the
    * assignment fold bit-for-bit (q100's CTEs), then ranks per cell.
    */
  val q112 = GraftQuery(
    "q112_d4_diversify",
    (s, d) => {
      val (cells, dim) = (8, 64)
      PrototypeDiversify.diversify(
        t(s, d, "embeddings").select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding")),
        jlPlanes(cells, dim), cells, dim, dropFrac = 0.25)
    },
    Some("""
      WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      nz AS (
        SELECT vec_id, emb FROM base
        WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(emb, y -> y * y)), (acc, v) -> acc + v) > 0),
      u AS (
        SELECT vec_id,
               list_transform(emb, x -> x /
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(emb, y -> y * y)),
                   (acc, v) -> acc + v))) AS unit
        FROM nz),
      cellscore AS (
        SELECT u.vec_id, CAST(c.cell AS INTEGER) AS cell,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(u.unit, (x, i) ->
                   (x - ((CAST(c.cell * 64 + (i - 1) AS BIGINT) * 1103515245
                          + 12345) % 2001 - 1000) / 1000.0)
                   * (x - ((CAST(c.cell * 64 + (i - 1) AS BIGINT) * 1103515245
                            + 12345) % 2001 - 1000) / 1000.0))),
                 (acc, v) -> acc + v) AS d
        FROM u CROSS JOIN range(8) AS c(cell)),
      assigned AS (
        SELECT vec_id, cell, d AS cdist
        FROM (SELECT vec_id, cell, d,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d, cell) AS rk
              FROM cellscore)
        WHERE rk = 1),
      sized AS (
        SELECT cell, COUNT(*) AS cell_size FROM assigned GROUP BY 1),
      ranked AS (
        SELECT a.vec_id, a.cell, a.cdist, s.cell_size,
               CAST(ROW_NUMBER() OVER (PARTITION BY a.cell
                                       ORDER BY a.cdist, a.vec_id)
                    AS INTEGER) AS proto_rank
        FROM assigned a JOIN sized s USING (cell))
      SELECT vec_id, cell, round(cdist, 6) AS cdist_r, cell_size,
             proto_rank,
             proto_rank > CAST(ceil(0.25 * cell_size) AS BIGINT) AS kept
      FROM ranked
      ORDER BY vec_id
    """))

  /** DuckDB replay of the full Lloyd loop ([[KMeans]] X65): the CTE
    * chain is generated per iteration — quantize, init from the k
    * smallest ids, then (assign, update) pairs and a final assignment.
    * Every step is integer arithmetic after the one shared
    * `round(x·10⁴)+8192` quantization, so the replay is bit-exact:
    * DuckDB's BIGINT sums (HUGEINT-widened, cast back) equal Spark's
    * long sums regardless of order, and `//` (floor) equals the
    * engine's `Math.floorDiv` update for all signs — including the
    * negative per-(cid,pos) sums unit-space training inputs can hit.
    */
  /** The k-means Lloyd-replay CTE block (integer-exact, so every SUM is
    * order-independent), parameterized on the (vec_id, $srcCol) source
    * relation so q116 can train on unit vectors; ends in the
    * `c$iters(cid, pos, c)` scaled-long centroid relation.
    */
  private def kmeansCtesSql(k: Int, dim: Int, iters: Int,
      srcRel: String, srcCol: String): String = {
    val steps = (0 until iters).map { t =>
      s"""
      d$t AS (
        SELECT comp.vec_id, c$t.cid,
               SUM((100 * comp.x - c$t.c) * (100 * comp.x - c$t.c)) AS d
        FROM comp JOIN c$t USING (pos)
        GROUP BY 1, 2),
      a$t AS (
        SELECT vec_id, cid
        FROM (SELECT vec_id, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d, cid) AS rn
              FROM d$t)
        WHERE rn = 1),
      c${t + 1} AS (
        SELECT a$t.cid, comp.pos,
               CAST((100 * SUM(comp.x)) // COUNT(*) AS BIGINT) AS c
        FROM comp JOIN a$t USING (vec_id)
        GROUP BY 1, 2),"""
    }.mkString
    s"""qv AS (
        SELECT vec_id,
               list_transform($srcCol,
                 x -> CAST(round(x * 10000) AS BIGINT) + 8192) AS q
        FROM $srcRel),
      comp AS (
        SELECT vec_id, i AS pos, q[i] AS x
        FROM (SELECT vec_id, q,
                     unnest(generate_series(1, $dim)) AS i FROM qv)),
      init AS (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                 AS cid
        FROM (SELECT vec_id FROM qv ORDER BY vec_id LIMIT $k)),
      c0 AS (
        SELECT init.cid, comp.pos, 100 * comp.x AS c
        FROM comp JOIN init USING (vec_id)),$steps
      cfin AS (SELECT cid, pos, c FROM c$iters)"""
  }

  private def kmeansOracleSql(k: Int, dim: Int, iters: Int): String = s"""
      WITH ${kmeansCtesSql(k, dim, iters,
        "embeddings", "embedding::DOUBLE[]")},
      dfin AS (
        SELECT comp.vec_id, cfin.cid,
               SUM((100 * comp.x - cfin.c)
                   * (100 * comp.x - cfin.c)) AS d
        FROM comp JOIN cfin USING (pos)
        GROUP BY 1, 2)
      SELECT vec_id, cid AS cluster, CAST(d AS BIGINT) AS d2
      FROM (SELECT vec_id, cid, d,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d, cid) AS rn
            FROM dfin)
      WHERE rn = 1
      ORDER BY vec_id
    """

  /** Distributed Lloyd k-means ([[KMeans]], X65): k=4, two updates
    * (three assignment passes), deterministic smallest-id init —
    * hash-exact because the whole loop is integer arithmetic over the
    * shared quantization grid.
    */
  val q114 = GraftQuery(
    "q114_kmeans",
    (s, d) => KMeans.fit(t(s, d, "embeddings"), k = 4, iters = 2, dim = 64),
    Some(kmeansOracleSql(k = 4, dim = 64, iters = 2)))

  /** SemDeDup driven by LEARNED centroids (the X65→X53 composition the
    * frozen-plane q100 stands in for at oracle scale): unitize the
    * planted corpus exactly as [[SemanticDedup.prune]] will, fit the
    * strict integer-exact k-means on those unit vectors, convert the
    * scaled-long model to unit space (one exact double op chain per
    * component), and hand it to the SAME prune operator. Hash-exact end
    * to end because every stage replays in SQL: the Lloyd loop is
    * integer arithmetic ([[kmeansCtesSql]]), the conversion is exact,
    * and the assignment/cosine folds are the ordered list_reduce
    * mirrors q100 established. The planted half-scale twins unitize
    * bit-identically to their originals (×0.5 is a pure exponent
    * shift), so they are cosine-1 duplicates by construction — the
    * semdedup_planted recall tracked in the bench artifact.
    */
  val q116 = GraftQuery(
    "q116_semantic_dedup_kmeans",
    (s, d) => {
      val (cells, dim) = (8, 64)
      val base = t(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val maxRow = base.agg(max(col("vec_id"))).head()
      val maxId = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)
      require(maxId < 1000000L,
        s"planted-id offset collides: max vec_id $maxId >= 1000000")
      val planted = base.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5d)).as("embedding"))
      val union = base.union(planted)
      val unitized = union
        .withColumn("nrm", sqrt(graft.functions.expressions
          .VectorFunctions.sqNorm(col("embedding"))))
        .filter(col("nrm") > lit(0.0d))
        .withColumn("unit",
          transform(col("embedding"), x => x / col("nrm")))
        .select(col("vec_id"), col("unit"))
      val centroids = KMeans.fitCentroidsUnit(unitized, cells,
        iters = 2, dim, vec = "unit")
      SemanticDedup.prune(union, centroids, cells, dim, minCos = 0.5)
    },
    Some(s"""
      WITH RECURSIVE base AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      uall AS (
        SELECT vec_id, emb FROM base
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(emb, x -> x * 0.5) AS emb
        FROM base),
      nz AS (
        -- zero-norm guard matching BOTH Spark faces: the k-means
        -- training frame filters nrm > 0, and prune itself excludes
        -- zero-norm rows before assignment (SemanticDedup.scala:91)
        SELECT vec_id, emb FROM uall
        WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(emb, y -> y * y)), (acc, v) -> acc + v) > 0),
      u AS (
        SELECT vec_id,
               list_transform(emb, x -> x /
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(emb, y -> y * y)),
                   (acc, v) -> acc + v))) AS unit
        FROM nz),
      ${kmeansCtesSql(8, 64, 2, "u", "unit")},
      centl AS (
        SELECT cid AS cell,
               list((CAST(c AS DOUBLE) / 100.0 - 8192) / 10000.0
                    ORDER BY pos) AS carr
        FROM cfin GROUP BY cid),
      cellscore AS (
        SELECT u.vec_id, CAST(centl.cell AS INTEGER) AS cell,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(u.unit, (x, i) ->
                   (x - centl.carr[i]) * (x - centl.carr[i]))),
                 (acc, v) -> acc + v) AS d
        FROM u CROSS JOIN centl),
      assigned AS (
        SELECT vec_id, cell, d AS cdist
        FROM (SELECT vec_id, cell, d,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d, cell) AS rk
              FROM cellscore)
        WHERE rk = 1),
      pairs AS (
        SELECT x.vec_id AS ia, y.vec_id AS ib
        FROM assigned x
        JOIN assigned y ON x.cell = y.cell AND x.vec_id < y.vec_id
        JOIN u ux ON ux.vec_id = x.vec_id
        JOIN u uy ON uy.vec_id = y.vec_id
        WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(ux.unit, (x, i) -> x * uy.unit[i])),
                (acc, v) -> acc + v) >= 0.5),
      nodes AS (
        SELECT ia AS id FROM pairs UNION SELECT ib FROM pairs),
      edges AS (
        SELECT ia AS src, ib AS dst FROM pairs
        UNION ALL
        SELECT ib, ia FROM pairs),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src),
      ccomp AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY 1),
      sized AS (
        SELECT group_id, COUNT(*) AS group_size FROM ccomp GROUP BY 1)
      SELECT c.id AS vec_id, a.cell, c.group_id, s.group_size,
             round(a.cdist, 6) AS cdist_r,
             ROW_NUMBER() OVER (PARTITION BY c.group_id
                                ORDER BY a.cdist DESC, c.id) = 1 AS kept
      FROM ccomp c
      JOIN sized s USING (group_id)
      JOIN assigned a ON a.vec_id = c.id
      ORDER BY vec_id
    """))

  /** D4 diversification on LEARNED centroids (the X65→X63 composition,
    * q116's sibling — with this, every frozen-plane centroid consumer
    * in the engine has a learned-model form): fit the strict
    * integer-exact k-means on the unitized corpus and hand the
    * converted model to the SAME diversify operator q112 runs. No
    * planted twins here (q112's shape): the point is the drop-rule
    * over real cells, and the Lloyd replay CTEs make the learned cells
    * hash-exact too.
    */
  val q121 = GraftQuery(
    "q121_d4_kmeans",
    (s, d) => {
      val (cells, dim) = (8, 64)
      val base = t(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val unitized = base
        .withColumn("nrm", sqrt(graft.functions.expressions
          .VectorFunctions.sqNorm(col("embedding"))))
        .filter(col("nrm") > lit(0.0d))
        .withColumn("unit",
          transform(col("embedding"), x => x / col("nrm")))
        .select(col("vec_id"), col("unit"))
      val centroids = KMeans.fitCentroidsUnit(unitized, cells,
        iters = 2, dim, vec = "unit")
      PrototypeDiversify.diversify(base, centroids, cells, dim,
        dropFrac = 0.25)
    },
    Some(s"""
      WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      nz AS (
        SELECT vec_id, emb FROM base
        WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(emb, y -> y * y)), (acc, v) -> acc + v) > 0),
      u AS (
        SELECT vec_id,
               list_transform(emb, x -> x /
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(emb, y -> y * y)),
                   (acc, v) -> acc + v))) AS unit
        FROM nz),
      ${kmeansCtesSql(8, 64, 2, "u", "unit")},
      centl AS (
        SELECT cid AS cell,
               list((CAST(c AS DOUBLE) / 100.0 - 8192) / 10000.0
                    ORDER BY pos) AS carr
        FROM cfin GROUP BY cid),
      cellscore AS (
        SELECT u.vec_id, CAST(centl.cell AS INTEGER) AS cell,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(u.unit, (x, i) ->
                   (x - centl.carr[i]) * (x - centl.carr[i]))),
                 (acc, v) -> acc + v) AS d
        FROM u CROSS JOIN centl),
      assigned AS (
        SELECT vec_id, cell, d AS cdist
        FROM (SELECT vec_id, cell, d,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d, cell) AS rk
              FROM cellscore)
        WHERE rk = 1),
      sized AS (
        SELECT cell, COUNT(*) AS cell_size FROM assigned GROUP BY 1),
      ranked AS (
        SELECT a.vec_id, a.cell, a.cdist, s.cell_size,
               CAST(ROW_NUMBER() OVER (PARTITION BY a.cell
                                       ORDER BY a.cdist, a.vec_id)
                    AS INTEGER) AS proto_rank
        FROM assigned a JOIN sized s USING (cell))
      SELECT vec_id, cell, round(cdist, 6) AS cdist_r, cell_size,
             proto_rank,
             proto_rank > CAST(ceil(0.25 * cell_size) AS BIGINT) AS kept
      FROM ranked
      ORDER BY vec_id
    """))

  val all: Seq[GraftQuery] =
    Seq(q45, q46, q65, q76, q89, q100, q112, q114, q116, q121)
}
