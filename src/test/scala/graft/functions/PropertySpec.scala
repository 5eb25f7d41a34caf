package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.operators.Q

/** Property-based invariants (SURVEY §5.2 item 4), scalacheck generators
  * batched through single DataFrames (per-case Spark jobs would be too
  * slow; the scalatestplus bridge isn't in the offline dep cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val texts: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(" ", "  ", "!", "?", "đ", "Ồ", "🙂", ",", "."))).map(_.mkString(" "))

  private def normalized(in: Seq[String]): Seq[String] =
    in.toDF("t").select(MockScorers.normalize(col("t"))).as[String].collect().toSeq

  test("normalize is idempotent and lands in [a-z0-9 ]* with single spaces") {
    val sample = Gen.listOfN(200, texts).sample.get
    val once = normalized(sample)
    val twice = normalized(once)
    assert(once === twice, "normalize must be idempotent")
    once.foreach { s =>
      assert(s.matches("[a-z0-9 ]*"), s"charset violation: '$s'")
      assert(!s.contains("  "), s"double space survived: '$s'")
      assert(s == s.trim)
    }
  }

  test("aspectPred is total and in range over arbitrary text") {
    val sample = Gen.listOfN(200, texts).sample.get
    val df = sample.toDF("t")
      .select(MockScorers.aspects.indices.map(i =>
        MockScorers.aspectPred(MockScorers.normalize(col("t")), i)
          .as(s"p$i")): _*)
    df.collect().foreach { r =>
      (0 until 8).foreach { i =>
        val v = r.getInt(i)
        assert(v >= 0 && v <= 3)
      }
    }
  }

  test("decodeSentiment inverts the class index deterministically") {
    val decoded = spark.range(4)
      .select(MockScorers.decodeSentiment(col("id").cast("int")).as("s"))
      .as[String].collect().toSeq
    assert(decoded === Seq("ABSENT", "NEG", "NEU", "POS"))
  }

  test("decimal dsum is partition-invariant (partial+final == single pass)") {
    val vals = Gen.listOfN(500,
      Gen.chooseNum(-99999L, 99999L).map(_ / 100.0)).sample.get
    val expected = BigDecimal(
      vals.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble)
    Seq(1, 7, 32).foreach { parts =>
      val got = vals.toDF("v").repartition(parts)
        .agg(Q.dsum(col("v")).as("s")).as[Double].first()
      assert(math.abs(got - expected.toDouble) < 1e-9,
        s"parts=$parts: $got != $expected")
    }
  }

  test("vehicle mock detection count matches label list length for any id") {
    val ids = Gen.listOfN(300, Gen.chooseNum(0L, 1000000L)).sample.get
    val df = ids.toDF("id").select(
      MockScorers.vehicleCount(col("id")).as("n"),
      MockScorers.vehicleType(col("id")).as("t"))
    df.collect().foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 5)
      assert(Set("car", "bus", "truck", "motorbike")(r.getString(1)))
    }
  }

  test("BPE segmentation is lossless for any word under any merge table") {
    import graft.operators.Bpe
    val word = Gen.listOfN(12, Gen.oneOf("a", "b", "c")).map(_.mkString)
    val pair = for {
      a <- Gen.listOfN(2, Gen.oneOf("a", "b", "c")).map(_.mkString)
      b <- Gen.listOfN(1, Gen.oneOf("a", "b", "c", "ab", "bc")).map(_.mkString)
    } yield (a.take(1 + a.length % 2), b)
    val cases = Gen.listOfN(300, Gen.zip(word, Gen.listOfN(6, pair)))
      .sample.get
    cases.foreach { case (w, merges) =>
      val ranks = Bpe.ranks(merges.distinct)
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString === w,
        s"'$w' under ${merges.distinct} segmented to ${toks.toSeq}")
      assert(w.isEmpty || toks.nonEmpty)
    }
  }

  test("BPE training is corpus-order and partitioning invariant") {
    import graft.operators.Bpe
    val docs = Gen.listOfN(40,
      Gen.listOfN(8, Gen.oneOf("aa", "ab", "abc", "bca", "cab", "aabb"))
        .map(_.mkString(" "))).sample.get
    val base = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val a = Bpe.train(base.toDF("doc_id", "text"), nMerges = 8)
    val b = Bpe.train(base.reverse.toDF("doc_id", "text").repartition(7),
      nMerges = 8)
    assert(a === b, "merge table must not depend on row order or layout")
  }
}
