package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** Asymmetric-overlap dedup operators (X72–X74) — the three near-dup
  * faces symmetric Jaccard misses, each a standard stage of a web-scale
  * curation pipeline (no reference counterpart; SURVEY §2.8 extension,
  * same family as X15/X57/X61):
  *
  *   - X72 containment pairs: |A∩B|/|A| catches a small doc swallowed
  *     by a big one (quote pages, boilerplate-wrapped copies) where
  *     J = |∩|/|∪| is diluted below any usable threshold.
  *   - X73 edit-distance verification: character-level Levenshtein
  *     similarity over candidate pairs — the verify stage that
  *     separates true re-editions from shingle-collision false
  *     positives; both engines implement the classic DP, so the
  *     similarity is hash-exact.
  *   - X74 suffix/prefix overlap stitching: doc A's tail equals doc
  *     B's head — the shard-boundary artifact crawl pipelines stitch
  *     or drop; an exact digest equi-join, never a pair scan.
  */
object OverlapQueries {

  /** Containment near-dup pairs (X72): over the shared distinct-3-gram
    * shingle frame ([[MinHashDedup.shingles]] — ONE shingle definition
    * project-wide), emit pairs whose LARGER directional containment
    * max(|∩|/|A|, |∩|/|B|) ≥ 0.8. The symmetric-Jaccard gate these
    * pairs fail can be arbitrarily low (|∩|/|∪| → 0 as |B| grows), so
    * this is a genuinely different recall face, not a retuned q42.
    *
    * Ratios are derived in exact integer micro-units (half-up, one
    * integer division — the q111 discipline) so no half-boundary row
    * can split the engines.
    *
    * Scale shape: the candidate face is the same inverted-index
    * co-occurrence join as q42 — the measured brute baseline. At 100 TB
    * the pair generation rides the X61 prefix filter on the SMALLER
    * side's rarest shingles (containment keeps the small-side prefix
    * bound: C(A→B) ≥ 0.8 needs 80 % of A's shingles in B, so A's
    * rarest ⌈0.2·|A|⌉+1 shingles must co-occur) — the same
    * cost-dispatch story q110 proves for Jaccard. The size-ratio cut
    * used by the symmetric path is deliberately ABSENT: small-in-big
    * is the signal here, not noise.
    */
  val q123 = GraftQuery(
    "q123_containment_pairs",
    (s, d) => {
      // r19 note (measured, left alone): the bruteJaccardPairs-style
      // shingle checkpoint measured FLAT here (1.83 → 1.81 s A/B at
      // sf0.1) — unlike the Jaccard family, q123 has no post-pair
      // consumers re-deriving the frame, so the planner's exchange
      // reuse already covers the self-join and only the sizes
      // aggregation re-derives. Kept the original plan.
      val sh = MinHashDedup.shingles(t(s, d, "documents"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
      val inter = a.join(b,
          a("shingle") === b("shingle") && col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("n_sh", "n_b"), "doc_b")
        // micro-unit ratios: (2e6·ni + n) div (2n), exact in longs
        .withColumn("__ca",
          expr("(2000000 * n_inter + n_a) div (2 * n_a)"))
        .withColumn("__cb",
          expr("(2000000 * n_inter + n_b) div (2 * n_b)"))
        .filter(greatest(col("__ca"), col("__cb")) >= lit(800000L))
        .select(col("doc_a"), col("doc_b"), col("n_inter"),
          col("n_a"), col("n_b"),
          (col("__ca").cast("double") / 1000000.0d).as("cont_a_in_b"),
          (col("__cb").cast("double") / 1000000.0d).as("cont_b_in_a"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH ${DedupQueries.shingleCtesSql},
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_inter
        FROM shingles a
        JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      scored AS (
        SELECT doc_a, doc_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
               (2000000 * n_inter + sa.n_sh) // (2 * sa.n_sh) AS ca,
               (2000000 * n_inter + sb.n_sh) // (2 * sb.n_sh) AS cb
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b)
      SELECT doc_a, doc_b, n_inter, n_a, n_b,
             CAST(ca AS DOUBLE) / 1000000.0 AS cont_a_in_b,
             CAST(cb AS DOUBLE) / 1000000.0 AS cont_b_in_a
      FROM scored
      WHERE greatest(ca, cb) >= 800000
      ORDER BY doc_a, doc_b
    """))

  /** Length cap for the X73 Levenshtein verify: the DP is O(L²) per
    * pair, so the verify runs on a fixed-length normalized prefix —
    * the bounded-work guard that keeps per-pair cost constant at any
    * corpus scale (both engines substring identically).
    */
  val EditPrefixChars = 400

  /** Edit-distance verification of near-dup candidates (X73): take the
    * Jaccard ≥ 0.3 candidate pairs (the bounded output of the shingle
    * stage) and verify at character level — Levenshtein similarity
    * 1 − lev/max(len) over [[EditPrefixChars]]-capped normalized
    * prefixes, keep ≥ 0.5. Shingle Jaccard and edit similarity rank
    * genuinely differently (transpositions and substitutions destroy
    * 3 grams per edit but cost 1 each here), so this is the standard
    * second-stage verifier, not a re-score.
    *
    * Scale shape: Levenshtein appears ONLY after candidate generation
    * (pair list ∝ near-dup rate, never all-pairs) and runs on capped
    * prefixes — fixed 400² DP cells per pair. The similarity is
    * derived in integer micro-units from the exact (lev, maxlen)
    * longs; both engines' classic DP returns identical integers.
    */
  val q124 = GraftQuery(
    "q124_edit_verify",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          substring(normalize(col("text")), 1, EditPrefixChars).as("p"))
      DedupQueries
        .bruteJaccardPairs(
          MinHashDedup.shingles(t(s, d, "documents")), 0.3)
        .join(docs.select(col("doc_id").as("doc_a"), col("p").as("pa")),
          "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("p").as("pb")),
          "doc_b")
        .withColumn("lev", levenshtein(col("pa"), col("pb")))
        .withColumn("maxlen",
          greatest(length(col("pa")), length(col("pb"))))
        // micro-units: sim = (maxlen - lev)/maxlen, half-up
        .withColumn("__mu", expr(
          "(2000000 * (maxlen - lev) + maxlen) div (2 * maxlen)"))
        .filter(col("__mu") >= lit(500000L))
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          col("lev"), col("maxlen"),
          (col("__mu").cast("double") / 1000000.0d).as("edit_sim"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH ${DedupQueries.jaccardPairsSqlAt("0.3")},
      prefixes AS (
        SELECT doc_id,
               substr(${normalizeSql("text")}, 1, $EditPrefixChars) AS p
        FROM documents),
      verified AS (
        -- INTEGER casts: Spark's levenshtein/length return int32
        SELECT p.doc_a, p.doc_b, p.jaccard,
               CAST(levenshtein(pa.p, pb.p) AS INTEGER) AS lev,
               CAST(greatest(length(pa.p), length(pb.p)) AS INTEGER)
                 AS maxlen
        FROM pairs p
        JOIN prefixes pa ON pa.doc_id = p.doc_a
        JOIN prefixes pb ON pb.doc_id = p.doc_b),
      mu AS (
        SELECT doc_a, doc_b, jaccard, lev, maxlen,
               (2000000 * (maxlen - lev) + maxlen) // (2 * maxlen) AS m
        FROM verified)
      SELECT doc_a, doc_b, jaccard, lev, maxlen,
             CAST(m AS DOUBLE) / 1000000.0 AS edit_sim
      FROM mu
      WHERE m >= 500000
      ORDER BY doc_a, doc_b
    """))

  /** Overlap window (words) for X74 stitch detection. */
  val StitchWords = 8

  /** Suffix/prefix overlap stitching (X74): find (doc_a, doc_b) where
    * A's last [[StitchWords]] normalized words equal B's first
    * [[StitchWords]] — the shard-boundary / pagination artifact a
    * crawl pipeline stitches into one document or drops as partial
    * copy. Pairs are found by an exact DIGEST equi-join (md5 of the
    * boundary window): tails join heads, no pair enumeration, no text
    * crossing the shuffle — the q40 digest discipline applied to
    * boundaries.
    *
    * The corpus has no natural W-word boundary matches (vocabulary is
    * tiny, texts are independent), so the query PLANTS them — the
    * q100/q116 planted-harness precedent: every doc with ≥ W words
    * gets a continuation twin (doc_id + 1000000) whose head IS the
    * original's tail; the expected pair set is exact by construction
    * and the oracle replays the same plant, so the join, the digest
    * discipline, and the stats all hash-check end to end.
    *
    * Scale shape: two digests per doc (map-side), one equi-join on the
    * 16-byte digest, group sizes bounded by true boundary-dup
    * multiplicity. At 100 TB this is strictly cheaper than q40 (the
    * digest frame is 2 rows/doc, the join hits only true overlaps).
    */
  val q125 = GraftQuery(
    "q125_overlap_stitch",
    (s, d) => {
      val w = StitchWords
      val base = t(s, d, "documents")
        .select(col("doc_id"), split(normalize(col("text")), " ").as("ws"))
        .filter(size(col("ws")) >= 2 * w) // head and tail must not overlap
      val maxRow = base.agg(max(col("doc_id"))).head()
      val maxId = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)
      require(maxId < 1000000L,
        s"planted-id offset collides: max doc_id $maxId >= 1000000")
      // continuation twin: head = original's tail (the plant), rest =
      // the original's head words so the twin is a same-length real doc
      val planted = base.select(
        (col("doc_id") + lit(1000000L)).as("doc_id"),
        concat(slice(col("ws"), -w, w),
          slice(col("ws"), lit(1), size(col("ws")) - w)).as("ws"))
      val all = base.unionByName(planted)
      // r19 optimization: the self-join's two sides project DIFFERENT
      // digest columns onto the join key (tail_h vs head_h), so their
      // exchanges are not identical and ReusedExchange cannot dedupe —
      // the normalize + split + planted-twin construction executed once
      // per side. Checkpoint the (doc_id, n_words, 2×digest) frame so
      // the text pass runs once.
      val edged = graft.Checkpoints.eager(
        all.select(col("doc_id"), size(col("ws")).as("n_words"),
          md5(concat_ws(" ", slice(col("ws"), lit(1), lit(w)))).as("head_h"),
          md5(concat_ws(" ", slice(col("ws"), -w, w))).as("tail_h")))
      edged.select(col("doc_id").as("doc_a"), col("n_words").as("n_a"),
          col("tail_h").as("h"))
        .join(edged.select(col("doc_id").as("doc_b"),
          col("n_words").as("n_b"), col("head_h").as("h")), "h")
        .filter(col("doc_a") =!= col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("h").as("overlap_hash"),
          col("n_a"), col("n_b"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id,
               string_split(${normalizeSql("text")}, ' ') AS ws
        FROM documents),
      eligible AS (
        SELECT doc_id, ws FROM base
        WHERE len(ws) >= ${2 * StitchWords}),
      planted AS (
        SELECT doc_id + 1000000 AS doc_id,
               list_concat(ws[-${StitchWords}:],
                 ws[1:len(ws) - ${StitchWords}]) AS ws
        FROM eligible),
      alldocs AS (
        SELECT doc_id, ws FROM eligible
        UNION ALL SELECT doc_id, ws FROM planted),
      edged AS (
        -- INTEGER cast: Spark's size() returns int32
        SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words,
               md5(array_to_string(ws[1:${StitchWords}], ' ')) AS head_h,
               md5(array_to_string(ws[-${StitchWords}:], ' ')) AS tail_h
        FROM alldocs)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.tail_h AS overlap_hash,
             a.n_words AS n_a, b.n_words AS n_b
      FROM edged a
      JOIN edged b ON a.tail_h = b.head_h AND a.doc_id <> b.doc_id
      ORDER BY doc_a, doc_b
    """))

  val all: Seq[GraftQuery] = Seq(q123, q124, q125)
}
