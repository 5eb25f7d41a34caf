package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q115's composed funnel (exact-fingerprint dedup → cost-dispatched
  * near-dup pair join → per-source report): pins WHICH pair-join branch
  * the [[PpJoin.jaccardPairsAuto]] dispatch takes when driven from
  * inside the pipeline, on a flat corpus (brute) and a planted
  * boilerplate corpus (prefix) — VERDICT r8 stretch 7. End-to-end
  * hash-exactness of the composition is the q115 DuckDB oracle's job;
  * this spec covers the dispatch decision, which no SQL oracle can see.
  */
class NearDupFunnelSpec extends AnyFunSuite with SparkSpec {

  private def docsOf(corpus: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    corpus.toDF("doc_id", "text", "source")
  }

  /** The dispatch marker: only the prefix path plans a rarity-rank
    * window (same detection as PpJoinSpec.usesPrefixPath).
    */
  private def plansWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  test("funnel report itself never plans a window (both branches aggregate it away)") {
    // guard for the marker's validity on the REPORT plan: the final
    // aggregate doesn't keep the window — so the branch must be pinned
    // on the pair frame, not the report (done below)
    val flat = docsOf((1L to 12L).map(id =>
      (id, s"alpha$id beta$id gamma$id delta$id", s"s${id % 3}")))
    assert(!plansWindow(DedupQueries.nearDupFunnel(flat).limit(1)))
  }

  test("flat corpus: the in-funnel dispatch picks the brute pair join") {
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 'z').map(c => s"$c$c")
    val corpus = (1L to 20L).map { id =>
      (id, Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        s"s${id % 3}")
    }
    // the stage the funnel hands to the dispatch: shingles of the
    // exact-dedup survivors (all 20 docs are fingerprint-unique)
    val sh = MinHashDedup.shingles(docsOf(corpus))
    val auto = PpJoin.jaccardPairsAuto(sh, 0.5)
    assert(!plansWindow(auto), "flat-df survivor corpus must run brute")
    // and the funnel still produces the right report over it
    val report = DedupQueries.nearDupFunnel(docsOf(corpus)).collect()
    assert(report.map(_.getLong(1)).sum === 20L,
      "no near-dups planted: every doc survives into the report")
  }

  test("boilerplate corpus: the in-funnel dispatch flips to the prefix join") {
    val suffix = "the quick brown fox jumps over the lazy dog end of text"
    val corpus = (1L to 200L).map { id =>
      (id, s"u$id v$id w$id x$id $suffix", s"s${id % 2}")
    }
    val sh = MinHashDedup.shingles(docsOf(corpus))
    assert(plansWindow(PpJoin.jaccardPairsAuto(sh, 0.5)),
      "boilerplate survivor corpus must run prefix")
    // exact duplicates planted on top are removed by the EXACT stage
    // first, so they never inflate the pair join's candidate face
    val withDups = corpus ++ Seq(
      (900L, corpus.head._2, "s0"), (901L, corpus(1)._2, "s1"))
    val report = DedupQueries.nearDupFunnel(docsOf(withDups))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = DedupQueries.nearDupFunnel(docsOf(corpus))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report === base,
      "exact dups (higher ids) must not change the funnel report")
  }
}
