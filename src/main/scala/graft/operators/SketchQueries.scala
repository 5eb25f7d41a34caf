package graft.operators

import Q._

/** Sketch-based operators registered for the driver (rows-only checks —
  * hash functions are engine-specific, so the oracle is brute force in
  * ScalaTest: SketchSpec).
  */
object SketchQueries {

  val q43 = GraftQuery(
    "q43_minhash_lsh_pairs",
    (s, d) => MinHashDedup.nearDuplicates(t(s, d, "documents"), 0.5),
    None)

  val q44 = GraftQuery(
    "q44_simhash_pairs",
    (s, d) => SimHash.nearPairs(t(s, d, "documents"), maxHamming = 3),
    None)

  val q52 = GraftQuery(
    "q52_ann_lsh_topk",
    (s, d) => AnnLsh.topK(t(s, d, "embeddings"), 0L to 9L, k = 5),
    None)

  val all: Seq[GraftQuery] = Seq(q43, q44, q52)
}
