package graft.operators

import graft.SparkSpec

/** [[KendallW]] (X235) oracles: W = 1 on a planted perfectly-
  * concordant corpus, and a full driver replay (rank the three
  * signals in Scala, fold W by hand) on the sf0.001 corpus.
  */
class KendallWSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("perfectly concordant judges: W = 1, mean Spearman = 1") {
    val dir = tmpDir("kw")
    // n_words, word length, AND alpha density all fall with doc_id
    // (alpha = Ln/(Ln+n-1) needs word LENGTH to fall too - with a
    // constant word, alpha RISES as word count falls)
    val ws = Seq("abcdefgh", "abcdefg", "abcdef", "abcde")
    (0 to 3).map { i =>
      val t = Seq.fill(50 - 10 * i)(ws(i)).mkString(" ")
      (i.toLong, t, "en", "s0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = KendallW.q267.build(spark, dir).collect()(0)
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 1.0)
  }

  test("sf0.001 corpus: W matches the driver-side rank replay") {
    import org.apache.spark.sql.functions._
    import graft.functions.MockScorers.normalize
    val sig = graft.sources.Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"),
        normalize(col("text")).as("norm"))
      .select(col("doc_id"),
        size(split(col("norm"), " ")).as("n_words"),
        (length(regexp_replace(col("norm"), " ", "")).cast("double") /
          size(split(col("norm"), " ")).cast("double")).as("word_len"),
        (regexp_count(col("text"), lit("[a-zA-Z]")).cast("double") /
          length(col("text")).cast("double")).as("alpha_ratio"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3)))
    val n = sig.length
    def ranks[A](key: Array[(Long, A)])(implicit ord: Ordering[A])
        : Map[Long, Long] =
      key.sortBy { case (id, k) => (k, id) }(
        Ordering.Tuple2(ord, implicitly[Ordering[Long]]))
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val rw = ranks(sig.map(s => s._1 -> -s._2.toLong))
    val rl = ranks(sig.map(s => s._1 -> -s._3))
    val ra = ranks(sig.map(s => s._1 -> -s._4))
    val s4 = sig.map { s =>
      val d = 2L * (rw(s._1) + rl(s._1) + ra(s._1)) - 3L * (n + 1L)
      BigDecimal(d.toDouble * d.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val w = s4 / (3.0 * (n.toDouble * n * n - n))
    val r = KendallW.q267.build(spark, sf0001).collect()(0)
    assert(r.getLong(0) === n.toLong)
    assert(r.getDouble(1) === round6(w))
    assert(r.getDouble(2) === round6((3.0 * w - 1.0) / 2.0))
  }
}
