package graft

import graft.operators.{Bpe, BpeNaive}

/** A/B harness for the r8 incremental BPE trainer (VERDICT r7 item 4):
  * 1k merges over a 64k-word vocabulary, incremental
  * ([[Bpe.trainFromVocab]]) vs the naive rescan loop ([[BpeNaive]]).
  * The vocab is synthetic word-soup drawn with the repo's LCG so the
  * run is reproducible; both arms are verified to produce identical
  * merges before timing is reported.
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val nMerges = args.headOption.map(_.toInt).getOrElse(1000)
    val nWords = 1 << 16

    var seed = 7L
    def next(m: Int): Int = { seed = seed * 1103515245L + 12345L
      ((seed % m + m) % m).toInt }
    // Zipf-ish counts and a 12-letter alphabet: plenty of shared
    // subwords, so late merges operate on pairs earlier merges created
    // (the regime where occurrence-index maintenance must hold up).
    // Draw until the vocab holds exactly nWords DISTINCT words —
    // collisions fold their counts in, as a real corpus vocab would.
    val alphabet = "abcdefghijkl"
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (m.size < nWords) {
      val w = (0 until (4 + next(10)))
        .map(_ => alphabet(next(alphabet.length))).mkString
      m.update(w, m.getOrElse(w, 0L) + (1L + 1000000L / (i + 10)))
      i += 1
    }
    val vocab = m.toSeq.sortBy(_._1)
    println(s"[prof] vocab: ${vocab.size} distinct words")

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $label: $s%.2f s")
      (r, s)
    }

    // warmup (JIT) on a small prefix, then the measured runs
    Bpe.trainFromVocab(vocab.take(2000), 50)
    BpeNaive.trainFromVocab(vocab.take(2000), 50)

    val (inc, tInc) =
      time(s"incremental $nMerges merges")(Bpe.trainFromVocab(vocab, nMerges))
    val (naive, tNaive) =
      time(s"naive       $nMerges merges")(BpeNaive.trainFromVocab(vocab, nMerges))
    require(inc == naive, "arms diverged — timing meaningless")
    println(f"[prof] speedup = ${tNaive / tInc}%.1f x (merges=${inc.size})")
  }
}
