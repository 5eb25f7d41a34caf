package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X78 — crawl-dump novelty curve: per dump (the `source` column read
  * as an ordered crawl sequence), how much of its distinct-shingle
  * content is NEW versus already seen in any earlier dump, plus the
  * cumulative distinct-corpus growth curve. This is the planning
  * number behind incremental crawl dedup (CommonCrawl's dump-over-dump
  * URL/content overlap reports, and the "how much does WET dump N add"
  * question every pretraining-data refresh starts with) — the exact
  * face of the estimate X75's KMV sketch gives in one pass.
  *
  * Determinism: first-seen attribution is `min(ord)` per shingle
  * DIGEST, counts are exact integers, the ratio uses the q111
  * micro-unit discipline, and the curve ends in a total ORDER BY.
  *
  * Scale shape: the only corpus-sized shuffle carries (digest, ord)
  * pairs — the shingle text is hashed to a 16-byte md5 BEFORE the
  * groupBy (the q40 digest discipline: text never crosses an
  * exchange). first-seen = one map-side-combined min-agg per digest;
  * the per-dump rollup joins digest frames (corpus-sized but narrow),
  * and the output frame is |dumps| rows with one tiny running-sum
  * window.
  */
object DumpNovelty {

  /** q129 — per-dump novelty and cumulative distinct-content growth. */
  val q129 = GraftQuery(
    "q129_dump_novelty",
    (s, d) => {
      val docs = t(s, d, "documents")
      // dump ordinal: numeric suffix of source ("src12" → 12). The
      // 'srcN' contract is load-bearing — a non-conforming source would
      // cast to a null ord and silently corrupt min(ord) first-seen
      // attribution (r10 ADVICE), so fail fast instead: any row whose
      // ordinal doesn't parse raises with the offending value.
      // try_cast, not cast: ANSI mode would throw a generic
      // CAST_INVALID_INPUT on e.g. "crawl-2024" but silently pass null
      // through for an empty substring ("abc" → ""); try_cast funnels
      // every non-conforming shape into the one contract error below
      val ordCol = expr("try_cast(substring(source, 4, 10) AS int)")
      // r19 note (measured, left alone): checkpointing this frame for
      // its two consumers measured SLOWER at sf0.1 (1.42 → 1.62 s A/B)
      // — the trailing `.distinct()` ends in an exchange that is
      // byte-identical under both consumers, so ReusedExchange already
      // dedupes the shingle+md5 pass and the checkpoint only added a
      // copy. Kept the reuse plan.
      val bySrc = MinHashDedup.shingles(docs)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(when(ordCol.isNotNull, ordCol)
          .otherwise(raise_error(concat(
            lit("DumpNovelty: source violates the 'srcN' contract: "),
            col("source"))).cast("int")).as("ord"),
          col("source"), md5(col("shingle")).as("dg"))
        .distinct()
      val firstSeen = bySrc.groupBy(col("dg")).agg(min(col("ord")).as("first_ord"))
      val perDump = bySrc
        .join(firstSeen, "dg")
        .groupBy(col("ord"), col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("first_ord") === col("ord"), 1L).otherwise(0L))
            .as("n_novel"))
      val w = Window.orderBy(col("ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDump
        // micro-unit novelty ratio: (2e6·novel + total) div (2·total)
        .withColumn("__mu",
          expr("(2000000 * n_novel + n_total) div (2 * n_total)"))
        .withColumn("cum_distinct", sum(col("n_novel")).over(w))
        .select(col("ord"), col("source"), col("n_total"), col("n_novel"),
          (col("__mu").cast("double") / 1000000.0d).as("novelty_ratio"),
          col("cum_distinct"))
        .orderBy(col("ord"))
    },
    Some(s"""
      WITH ${DedupQueries.shingleCtesSql},
      bysrc AS (
        SELECT DISTINCT CAST(substr(d.source, 4, 10) AS INTEGER) AS ord,
               d.source, md5(s.shingle) AS dg
        FROM shingles s JOIN documents d USING (doc_id)),
      firstseen AS (
        SELECT dg, min(ord) AS first_ord FROM bysrc GROUP BY 1),
      perdump AS (
        SELECT b.ord, b.source, count(*) AS n_total,
               CAST(sum(CASE WHEN f.first_ord = b.ord THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel
        FROM bysrc b JOIN firstseen f USING (dg)
        GROUP BY 1, 2)
      SELECT ord, source, n_total, n_novel,
             CAST((2000000 * n_novel + n_total) // (2 * n_total)
                  AS DOUBLE) / 1000000.0 AS novelty_ratio,
             CAST(sum(n_novel) OVER (ORDER BY ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_distinct
      FROM perdump
      ORDER BY ord
    """))

  val all: Seq[GraftQuery] = Seq(q129)
}
