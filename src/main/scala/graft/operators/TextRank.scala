package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X77 — TextRank keyword salience: fixed-iteration weighted PageRank
  * over the adjacent-word co-occurrence graph (Mihalcea & Tarau,
  * "TextRank: Bringing Order into Text", EMNLP 2004; the random-walk
  * centrality face of the X70 collocation graph). The production use
  * in a curation pipeline is corpus-level salient-term extraction —
  * the keywords feeding topic labeling and domain-mix audits.
  *
  * Determinism discipline (why this is hash-exact while textbook
  * PageRank is not): scores live in integer micro-units (start 10⁶),
  * every damping step is
  * `s'(w) = 150000 + (85 · Σ_u (s(u)·cnt(u,w)) div wdeg(u)) div 100`
  * — pure non-negative integer arithmetic, where Spark `div` equals
  * DuckDB `//` (both floor for non-negative operands). A fixed
  * [[Iters]] iterations replace the convergence test, so both engines
  * run the identical computation and the oracle unrolls the loop as
  * CTE chains (the q114/q116 Lloyd-replay precedent).
  *
  * Scale shape: the token stream is exploded ONCE (the q122
  * zip-with-tail form — the positional self-join measured super-linear
  * and was replaced in r9); everything after lives in vocab-sublinear
  * frames (edges = distinct adjacent pairs, nodes = vocabulary), and
  * each iteration is one map-side-combined groupBy over the edge
  * frame. Iterations are sequential by nature (same as
  * [[ConnectedComponents]]/[[KMeans]]); at 100 TB each iteration's
  * score frame is vocab-sized — megabytes, not corpus-sized — and the
  * edge frame is built once and cached.
  *
  * Overflow bounds: Σs is conserved at ≈ V·10⁶; a hub score ≤ 0.85·Σs,
  * so s·cnt ≤ 0.85·V·10⁶·cnt — with V ≤ 10⁷ and cnt ≤ 10⁶ this needs
  * decimal width only past ~10¹⁹; the engine guards the realistic
  * range (V·cnt < 9·10¹²) and documents the decimal(38) upgrade path
  * q122 already took for its lift arithmetic.
  */
object TextRank {

  /** Fixed damping iterations — enough for the ranking to stabilize on
    * vocabulary-sized graphs while keeping the oracle unroll readable.
    */
  val Iters = 5

  /** Top keywords emitted. */
  val TopN = 30

  /** The symmetric weighted adjacency (u, v, cnt, wdeg(u)) built from
    * one explode of the token stream.
    */
  def edges(docs: DataFrame): DataFrame = {
    val docsWs = docs
      .select(split(normalize(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val adj = docsWs
      .select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("u"), b.as("v")))).as("p"))
      .select(col("p.u"), col("p.v"))
      .filter(col("u") =!= "" && col("v") =!= "" && col("u") =!= col("v"))
    adj.unionByName(adj.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cnt"))
  }

  /** q128 — salient keywords by integer-exact TextRank. Output: rank,
    * word, raw micro-unit score, and the score as a double.
    */
  val q128 = GraftQuery(
    "q128_textrank_keywords",
    (s, d) => {
      val e = edges(t(s, d, "documents"))
      val deg = e.groupBy(col("u")).agg(sum(col("cnt")).as("wdeg"))
      // r19 note (measured, then deliberately left alone): the former
      // persist() here was dead code — unpersist ran in the builder
      // before any action, so no execution ever read the cache — and
      // the plan is ALREADY single-pass: the five iteration joins
      // carry identical ew subtrees and Spark's ReusedExchange
      // materializes the exchange once. Both materialization variants
      // were measured SLOWER at sf0.1 (plain eagerCheckpoint 2.10 s,
      // repartition(u)+checkpoint 2.70 s, vs 1.84 s as-is): the
      // checkpoint copy costs more than the planner-level reuse it
      // replaces. Dropped the dead persist, kept the reuse plan.
      val ew = e.join(deg, "u")
      var sc = deg.select(col("u").as("w"), lit(1000000L).as("s"))
      var t0 = 0
      while (t0 < Iters) {
        sc = ew
          .join(sc.withColumnRenamed("w", "u"), "u")
          .withColumn("term", expr("(s * cnt) div wdeg"))
          .groupBy(col("v"))
          .agg(sum(col("term")).as("contrib"))
          .select(col("v").as("w"),
            (lit(150000L) + expr("(85 * contrib) div 100")).as("s"))
        t0 += 1
      }
      val out = sc
        .select(col("w").as("word"), col("s").as("score_mu"),
          (col("s").cast("double") / 1000000.0d).as("score"))
        .orderBy(col("score_mu").desc, col("word"))
        .limit(TopN)
        .withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("score_mu").desc, col("word"))))
        .select(col("rank"), col("word"), col("score_mu"), col("score"))
        .orderBy(col("rank"))
      out
    },
    Some {
      val steps = (0 until Iters).map { t =>
        s"""
      s${t + 1} AS (
        SELECT e.v AS w,
               CAST(150000 + (85 * SUM((s$t.s * e.cnt) // e.wdeg)) // 100
                    AS BIGINT) AS s
        FROM e JOIN s$t ON s$t.w = e.u
        GROUP BY 1),"""
      }.mkString
      s"""
      WITH docs AS (
        SELECT string_split(${normalizeSql("text")}, ' ') AS ws
        FROM documents
        WHERE len(string_split(${normalizeSql("text")}, ' ')) >= 2),
      adj0 AS (
        SELECT w1 AS u, w2 AS v FROM (
          SELECT unnest(ws[1:len(ws) - 1]) AS w1,
                 unnest(ws[2:len(ws)]) AS w2
          FROM docs)
        WHERE w1 <> '' AND w2 <> '' AND w1 <> w2),
      adj AS (
        SELECT u, v FROM adj0 UNION ALL SELECT v, u FROM adj0),
      edges AS (SELECT u, v, COUNT(*) AS cnt FROM adj GROUP BY 1, 2),
      deg AS (SELECT u, SUM(cnt) AS wdeg FROM edges GROUP BY 1),
      e AS (
        SELECT edges.u, edges.v, edges.cnt, deg.wdeg
        FROM edges JOIN deg USING (u)),
      s0 AS (SELECT u AS w, CAST(1000000 AS BIGINT) AS s FROM deg),$steps
      ranked AS (
        SELECT w AS word, s AS score_mu,
               CAST(s AS DOUBLE) / 1000000.0 AS score,
               CAST(ROW_NUMBER() OVER (ORDER BY s DESC, w)
                    AS INTEGER) AS rank
        FROM s$Iters)
      SELECT rank, word, score_mu, score
      FROM ranked
      WHERE rank <= $TopN
      ORDER BY rank
    """
    })

  val all: Seq[GraftQuery] = Seq(q128)
}
