package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zipf-skewed decade arm for the X61 prefix filter (r10 verdict item
  * 6): the flat-df replica corpus ProfileSfx builds is the regime where
  * q110 ≈ q42 BY DESIGN (no common-shingle mass for the prefix to
  * drop), so the measured 5.8–20× prefix win existed only as the
  * ProfileJaccard boilerplate anecdote. This probe generates a
  * deterministic Zipf-token corpus with a Heaps-growing vocabulary at
  * 1× and 10×, and publishes the q42-vs-q110 decade side by side —
  * the win as a SCALING number.
  *
  * Generator (all column expressions, no driver rows): a doc is a
  * sequence of PHRASES (3 words each), phrase rank drawn Zipf s=1 via
  * the inverse CDF r = floor(V^u) (u from an integer hash), phrase
  * vocabulary V(P) = ceil(2·P^0.65) over total phrase draws — Heaps'
  * law. Drawing at the PHRASE level is what makes the corpus
  * prefix-filter-relevant: repeated phrases produce repeated word
  * 3-GRAMS (the shingle unit), exactly like crawl boilerplate — an
  * independent-token Zipf draw yields near-unique shingles (measured:
  * shingle dfMax 43 on 150k tokens) and stresses nothing.
  *
  * Run: sbt "Test/runMain graft.ProfileZipfDecade"
  */
object ProfileZipfDecade {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 32)
    spark.sparkContext.setLogLevel("WARN")

    val docsPerScale = 5000
    val phrasesPerDoc = 10
    val wordsPerPhrase = 3

    def corpus(nDocs: Int): DataFrame = {
      val totalPhrases = nDocs.toLong * phrasesPerDoc
      val vocab = math.ceil(2.0 * math.pow(totalPhrases.toDouble, 0.65)).toLong
      // phrase rank per (doc, slot): u from a 2-round integer mix,
      // r = floor(V^u) clamped to [1, V]; the phrase expands to 3
      // deterministic words p<r>a p<r>b p<r>c
      spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(phrasesPerDoc - 1)),
          s => {
            val x = col("id") * phrasesPerDoc + s
            val h = abs(hash(x * 2654435761L + 11, x + 7)).cast("double")
            val u = h / 2147483647.0d
            val r = least(greatest(floor(pow(lit(vocab.toDouble), u)),
              lit(1.0)), lit(vocab.toDouble)).cast("long")
            concat_ws(" ", (0 until wordsPerPhrase).map(k =>
              concat(lit("p"), r, lit(('a' + k).toChar.toString))): _*)
          })).as("text"))
    }

    def minOf(reps: Int)(f: => Long): (Double, Long) = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    val tmp = sys.props("java.io.tmpdir")
    val results = Seq(1 -> docsPerScale, 10 -> docsPerScale * 10).map {
      case (mult, nDocs) =>
        val dir = s"$tmp/graft-zipf-$mult"
        corpus(nDocs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val sh = graft.operators.MinHashDedup.shingles(docs)
        // df profile so SCALE.md can cite the skew being probed
        val prof = sh.groupBy(col("shingle")).count()
          .agg(count(lit(1)).as("v"), max(col("count")).as("dfmax"),
            sum(col("count") * col("count")).as("sumdf2")).collect()(0)
        println(s"[prof] zipf ${mult}x: docs=$nDocs shingleVocab=" +
          s"${prof.getLong(0)} dfMax=${prof.getLong(1)} sumDf2=${prof.getLong(2)}")
        val (tB, nB) = minOf(2)(
          graft.operators.DedupQueries.bruteJaccardPairs(sh, 0.5).count())
        val (tP, nP) = minOf(2)(
          graft.operators.PpJoin.jaccardPairs(sh, 0.5).count())
        require(nB == nP,
          s"pair counts diverge at ${mult}x: brute=$nB prefix=$nP")
        println(f"[prof] zipf ${mult}x: brute $tB%.2f s, prefix $tP%.2f s " +
          f"(win ${tB / tP}%.2fx, $nB pairs)")
        (tB, tP)
    }
    ProfileCleanup(
      Seq(1, 10).map(m => s"$tmp/graft-zipf-$m"): _*)
    val (b1, p1) = results(0); val (b10, p10) = results(1)
    println(f"[prof] zipf decade: brute ${b10 / b1}%.1fx " +
      f"(exponent ${math.log10(b10 / b1)}%.2f), prefix ${p10 / p1}%.1fx " +
      f"(exponent ${math.log10(p10 / p1)}%.2f), " +
      f"win at 10x ${b10 / p10}%.2fx")
    spark.stop()
  }
}
