package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X171 — vocabulary saturation curve (the Heaps'-law audit; Heaps
  * 1978, Herdan 1960): split the corpus into k deterministic ingest
  * shards and measure how many NEW token types each additional shard
  * contributes — the "is more data still buying vocabulary?" curve a
  * data-acquisition team reads before paying for the next crawl, and
  * the empirical-growth companion to X68's fixed-vocab coverage (X68
  * asks how much of a GIVEN vocab the corpus hits; this asks how fast
  * the corpus GROWS one).
  *
  * The distributed trick that makes the cumulative-distinct curve ONE
  * aggregation instead of k growing distinct-counts: a token type is
  * new at shard s iff s = MIN(shard over its occurrences) — so
  * per-type min-shard (one groupBy on the token frame) followed by a
  * count per shard IS the marginal-new-types series, and the
  * cumulative curve is a prefix sum over the k-row result. Exact
  * longs everywhere; no sketch, no re-scan per prefix.
  *
  * Scale shape: one corpus scan → token explode → two map-side-
  * combined groupBys (token-type frame = |vocab| rows, then k rows)
  * + one groupBy for per-shard occurrence/doc marginals + two prefix
  * windows on the k-row frame. The |vocab| exchange is the operator's
  * irreducible cost and is shared with X44/X68/X94's token census.
  * Shards are doc_id mod k — deterministic, engine-independent, and
  * exactly how a k-tranche ingest would arrive.
  */
object VocabSaturation {

  val Shards = 10

  /** The saturation curve over a (doc_id, text) frame. */
  def curve(documents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val docs = documents
      .select(col("doc_id"), (col("doc_id") % Shards).as("shard"),
        col("text"))
        val toks = docs
          .select(col("shard"), col("doc_id"),
            explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val firstSeen = toks.groupBy(col("tok"))
          .agg(min(col("shard")).as("shard"))
          .groupBy(col("shard")).agg(count(lit(1)).as("new_types"))
        val marginals = toks.groupBy(col("shard"))
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct(col("doc_id")).as("n_docs"))
        val w = Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        marginals.join(firstSeen, Seq("shard"), "left")
          .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
          .withColumn("cum_types", sum(col("new_types")).over(w))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .orderBy(col("shard"))
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            col("new_types"), col("cum_types"), col("cum_tokens"))
  }

  /** q210 — per-shard new token types + the cumulative curve. */
  val q210 = GraftQuery(
    "q210_vocab_saturation",
    (s, d) => curve(t(s, d, "documents")),
    Some(s"""
      WITH toks AS (
        SELECT doc_id % $Shards AS shard, doc_id, tok
        FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
        WHERE tok <> ''),
      first_seen AS (
        SELECT shard, COUNT(*) AS new_types
        FROM (SELECT tok, MIN(shard) AS shard FROM toks GROUP BY tok)
        GROUP BY shard),
      marginals AS (
        SELECT shard, COUNT(*) AS n_tokens,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM toks GROUP BY shard)
      SELECT m.shard, m.n_docs, m.n_tokens,
             COALESCE(f.new_types, 0) AS new_types,
             CAST(SUM(COALESCE(f.new_types, 0)) OVER (ORDER BY m.shard
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_types,
             CAST(SUM(m.n_tokens) OVER (ORDER BY m.shard
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens
      FROM marginals m LEFT JOIN first_seen f ON m.shard = f.shard
      ORDER BY m.shard
    """))

  val all: Seq[GraftQuery] = Seq(q210)
}
