package graft.operators

import scala.collection.mutable

/** The pre-r8 rescan-everything BPE train loop, kept in TEST scope as
  * the equivalence oracle for [[Bpe.trainFromVocab]]'s incremental
  * refinement (and ProfileBpe's A/B baseline): recount every word's
  * adjacent pairs from scratch each round — O(nMerges × vocab × word
  * length), obviously correct.
  */
object BpeNaive {
  def trainFromVocab(vocabCounts: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      vocabCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.keysIterator.reduceLeft { (p, q) =>
          val np = counts(p); val nq = counts(q)
          if (nq > np || (nq == np && (q._1 < p._1 ||
            (q._1 == p._1 && q._2 < p._2)))) q else p
        }
        merges += best
        words = words.map { case (syms, c) =>
          (Bpe.applyMerge(syms, best), c)
        }
      }
    }
    merges.toSeq
  }
}
