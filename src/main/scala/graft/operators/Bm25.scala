package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X82 — BM25 ranked retrieval (Robertson & Zaragoza, "The
  * Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009):
  * the lexical scorer every hybrid (sparse + dense) retrieval stack
  * pairs with the engine's ANN tiers, and the standard hard-negative
  * source for training dual encoders (the X81 companion — DPR mines
  * its negatives from exactly this scorer).
  *
  * Cross-engine determinism WITHOUT integer surrogates: every float in
  * the score is produced by the SAME literal expression tree in Spark
  * and DuckDB — idf from one ln per query TERM (4 calls total, on
  * arguments that are exact-integer ratios), avgdl as ONE IEEE
  * division of two exact longs, the tf saturation from those, and the
  * final score as a FIXED-ORDER sum of the per-term columns (a pivot to
  * columns, NOT a groupBy sum — a float groupBy sum is
  * partition-order-dependent, the q45 lesson applied to scoring).
  * Bit-identical inputs + identical op order = bit-identical doubles,
  * so the ranking and the rounded report hash-match.
  *
  * Scale shape: token explode → two map-side-combined aggs (tf per
  * (doc, term) — only QUERY terms survive the pushed-down isin filter
  * — and dl per doc); df and the corpus stats are term-count-sized and
  * 1-row frames (broadcast unhinted, the q101 precedent); the only
  * corpus-sized shuffles carry (doc_id, long) pairs. Top-k is a
  * window over the scored frame — at production |Q| the per-query
  * partial top-k merge (q33's TopKPerGroup) drops in unchanged.
  */
object Bm25 {

  /** Query terms (fixed corpus-vocabulary probe query). */
  val Terms = Seq("hash", "join", "window", "stream")

  val K1 = 1.2
  val B = 0.75
  val TopK = 15

  /** The shared scoring tail: (doc_id, tok, tf) × df × dl × stats →
    * ranked top-k — ONE implementation for the recompute form (q133)
    * and the maintained-state form (q157), so the scoring contract
    * cannot drift between them.
    */
  private def scoreAndTop(tf: org.apache.spark.sql.DataFrame,
      df: org.apache.spark.sql.DataFrame,
      dl: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // the dl join is PINNED to sort-merge (r16, VERDICT r15 item 2):
    // dl is corpus-sized (one row per doc), which at sf0.1 sits right
    // at AQE's runtime broadcast threshold — the join (it occurs twice
    // in the executed tree) flipped BHJ↔SMJ between identical runs,
    // the sole source of q157's three plan hashes. SMJ is also the
    // only plan that survives 100 TB (a per-doc frame outgrows any
    // broadcast), so the hint pins the plan to the scale-correct
    // strategy rather than allowlisting the coin flip.
    val scored = tf
      .join(broadcast(df), "tok")
      .join(dl.hint("merge"), "doc_id")
      .join(broadcast(stats))
      // identical literal expression tree on both engines:
      // idf = ln(1 + (N - df + 0.5)/(df + 0.5))
      .withColumn("idf", log(lit(1.0d) +
        (col("n_docs").cast("double") - col("df").cast("double")
          + lit(0.5d)) / (col("df").cast("double") + lit(0.5d))))
      .withColumn("tff",
        (col("tf").cast("double") * lit(K1 + 1.0)) /
          (col("tf").cast("double") + lit(K1) * (lit(1.0 - B) +
            lit(B) * (col("dl").cast("double") / col("avgdl")))))
      .withColumn("s", col("idf") * col("tff"))
    // fixed-order per-term columns → fixed-order final sum
    def termCol(term: String): Column =
      coalesce(max(when(col("tok") === term, col("s"))), lit(0.0d))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(termCol(Terms(0)).as("s0"), termCol(Terms(1)).as("s1"),
        termCol(Terms(2)).as("s2"), termCol(Terms(3)).as("s3"))
      .withColumn("score",
        col("s0") + col("s1") + col("s2") + col("s3"))
    // distributed partial top-k (TakeOrderedAndProject), NOT a
    // global window over the corpus-sized scored frame; the rank
    // window then runs over the 15 surviving rows only
    val top = perDoc.orderBy(col("score").desc, col("doc_id")).limit(TopK)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    top
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), round(col("score"), 4).as("bm25_r"))
      .orderBy(col("rank"))
  }

  /** q133 — BM25 top-15 for the probe query. */
  val q133 = GraftQuery(
    "q133_bm25_retrieval", {
      (s, d) => {
        val docs = t(s, d, "documents")
        val toks = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
          .select(col("n_docs"),
            (col("sum_dl").cast("double") / col("n_docs").cast("double"))
              .as("avgdl"))
        val qtoks = toks.filter(col("tok").isin(Terms: _*))
        val df = qtoks.groupBy(col("tok"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val tf = qtoks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        scoreAndTop(tf, df, dl, stats)
      }
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      toks2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY 1),
      stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl),
      qt AS (SELECT doc_id, tok FROM toks2
             WHERE tok IN (${Terms.map("'" + _ + "'").mkString(", ")})),
      df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM qt GROUP BY 1, 2),
      scored AS (
        SELECT tf.doc_id, tf.tok,
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE)
                 + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * ${K1 + 1.0}) /
                  (CAST(tf.tf AS DOUBLE) + $K1 * (${1.0 - B} +
                   $B * (CAST(dl.dl AS DOUBLE) / s.avgdl)))) AS sc
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
        CROSS JOIN stats s),
      perdoc AS (
        SELECT doc_id,
               coalesce(max(CASE WHEN tok = '${Terms(0)}' THEN sc END), 0.0)
               + coalesce(max(CASE WHEN tok = '${Terms(1)}' THEN sc END), 0.0)
               + coalesce(max(CASE WHEN tok = '${Terms(2)}' THEN sc END), 0.0)
               + coalesce(max(CASE WHEN tok = '${Terms(3)}' THEN sc END), 0.0)
                 AS score
        FROM scored GROUP BY 1),
      ranked AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM perdoc)
      SELECT CAST(rank AS INTEGER) AS rank, doc_id,
             round(score, 4) AS bm25_r
      FROM ranked
      WHERE rank <= $TopK
      ORDER BY rank
    """))

  // ---- X111: incremental index/stats maintenance -------------------

  /** Mergeable retrieval-state partials of a doc batch: the POSTINGS
    * rows (kind='p': term, doc, tf) and the doc-length rows (kind='d':
    * doc, dl) in one frame. df, n_docs, and avgdl all DERIVE from this
    * state, so nothing needs a corpus rescan as batches arrive — this
    * is the inverted index itself kept as X98-mergeable state
    * (ingest batches are disjoint doc sets — the X46 curation
    * contract — so the groupBy-sum combine is exact).
    */
  def statsPartials(batch: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val toks = batch
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val postings = toks.groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .select(lit("p").as("kind"), col("tok"), col("doc_id"), col("n"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .select(lit("d").as("kind"), lit(null).cast("string").as("tok"),
        col("doc_id"), col("n"))
    postings.unionByName(dl)
  }

  /** Combine two state frames — additive per (kind, term, doc). */
  def statsCombine(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    a.unionByName(b).groupBy(col("kind"), col("tok"), col("doc_id"))
      .agg(sum(col("n")).as("n"))

  /** Merge one doc batch into the retrieval state — exactly-once by
    * batch id (the X98 contract).
    */
  def mergeStatsOnce(batch: org.apache.spark.sql.DataFrame, path: String,
      batchId: Long): Unit =
    MaterializedAgg.mergeOnceAs(batch, path, batchId,
      statsPartials, statsCombine)

  /** Score the probe query against the MAINTAINED state: postings for
    * the query terms (a pushed-down filter on the state scan — at
    * scale, with the state range-partitioned by term, a file-skipping
    * read), df/dl/avgdl derived from the same state, the shared
    * scoring tail. No corpus access at all.
    */
  def scoreFromState(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    MaterializedAgg.recover(spark, path)
    val st = spark.read.parquet(path)
    val dl = st.filter(col("kind") === "d")
      .select(col("doc_id"), col("n").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val tf = st.filter(col("kind") === "p" && col("tok").isin(Terms: _*))
      .select(col("doc_id"), col("tok"), col("n").as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    scoreAndTop(tf, df, dl, stats)
  }

  /** q157 — the maintenance loop END TO END: the corpus arrives as 4
    * disjoint batches (doc_id % 4), the index state absorbs each, and
    * scoring against the state must reproduce q133's full-recompute
    * ranking EXACTLY (same oracle SQL — the maintained index is
    * indistinguishable from the rescan).
    */
  val q157 = GraftQuery(
    "q157_bm25_incremental",
    { (s, d) =>
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val path = Scratch.fresh("q157-state") + "/state"
      (0 to 3).foreach(b =>
        mergeStatsOnce(docs.filter(pmod(col("doc_id"), lit(4)) === b),
          path, b.toLong))
      scoreFromState(s, path)
    },
    q133.oracle)

  val all: Seq[GraftQuery] = Seq(q133, q157)
}
