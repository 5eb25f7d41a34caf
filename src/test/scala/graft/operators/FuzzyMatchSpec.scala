package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.StringAlgos

/** [[FuzzyMatch]] (X155) + the native Damerau-Levenshtein kernel.
  *
  * Kernel oracle: breadth-first search in STRING SPACE over the four
  * unit edits (insert / delete / substitute / transpose-adjacent) — an
  * implementation-independent definition of the unrestricted distance
  * — over every string pair up to length 3 on a 3-letter alphabet,
  * plus the CA→ABC=2 witness that separates the Lowrance-Wagner
  * distance from the restricted OSA variant (OSA says 3; DuckDB's
  * `damerau_levenshtein`, the q196 oracle, says 2).
  */
class FuzzyMatchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** BFS edit distance with the four unit ops — the definition. */
  private def bfsDistance(a: String, b: String): Int = {
    if (a == b) return 0
    val alphabet = (a + b).toSet.toSeq
    def nexts(s: String): Seq[String] = {
      val del = s.indices.map(i => s.take(i) + s.drop(i + 1))
      val ins = for (i <- 0 to s.length; c <- alphabet)
        yield s.take(i) + c + s.drop(i)
      val sub = for (i <- s.indices; c <- alphabet if c != s(i))
        yield s.updated(i, c)
      val tra = (0 until s.length - 1).map(i =>
        s.take(i) + s(i + 1) + s(i) + s.drop(i + 2))
      del ++ ins ++ sub ++ tra
    }
    var frontier = Set(a)
    var seen = Set(a)
    var depth = 0
    while (depth <= a.length + b.length) {
      depth += 1
      frontier = frontier.flatMap(nexts).diff(seen)
      if (frontier(b)) return depth
      seen ++= frontier
    }
    sys.error(s"BFS failed for $a -> $b")
  }

  test("kernel == BFS definition on all pairs up to length 3 over {a,b,c}") {
    val alphabet = Seq("a", "b", "c")
    val strings = Seq("") ++ alphabet ++
      (for (x <- alphabet; y <- alphabet) yield x + y) ++
      (for (x <- alphabet; y <- alphabet; z <- alphabet) yield x + y + z)
    for (s <- strings; u <- strings) {
      assert(StringAlgos.damerauLevenshtein(s, u) === bfsDistance(s, u),
        s"dl('$s','$u')")
    }
  }

  test("unrestricted witness: CA->ABC is 2 (transpose then insert), " +
      "not OSA's 3 — the variant DuckDB implements") {
    assert(StringAlgos.damerauLevenshtein("CA", "ABC") === 2)
    assert(StringAlgos.damerauLevenshtein("abcd", "acbd") === 1)
    assert(StringAlgos.damerauLevenshtein("kitten", "sitting") === 3)
    assert(StringAlgos.damerauLevenshtein("", "abc") === 3)
  }

  test("q196: a planted transposition typo matches at distance 1, an " +
      "identical name in a DIFFERENT block does not surface, and the " +
      "length gate keeps a distance-exactly-tau pair") {
    val dir = tmpDir("fuzzy")
    Seq(
      (1L, "widget grande", "B1", "T1", 10),
      (2L, "widgte grande", "B1", "T1", 10), // transposition typo
      (3L, "widget grande", "B2", "T1", 10), // identical, other block
      (4L, "widget grandexyz", "B1", "T1", 10), // +3 inserts = tau
      (5L, "unrelated name", "B1", "T1", 10))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .selectExpr("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "1.0 as p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = FuzzyMatch.q196.build(spark, dir).collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        r.getAs[Int]("dl"))).toSet
    assert(out === Set((1L, 2L, 1), (1L, 4L, 3)),
      "(2,4) is distance 4 — transpose + 3 inserts — and stays out")
  }

  test("q196 at sf0.001 == driver replay through the kernel") {
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .selectExpr("p_partkey", "p_brand", "p_type", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val expected = (for {
      a <- parts; b <- parts
      if a._2 == b._2 && a._3 == b._3 && a._1 < b._1
      if math.abs(a._4.length - b._4.length) <= FuzzyMatch.Tau
      dl = StringAlgos.damerauLevenshtein(a._4, b._4)
      if dl <= FuzzyMatch.Tau
    } yield (a._1, b._1, dl)).toSet
    val got = FuzzyMatch.q196.build(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        r.getAs[Int]("dl"))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "sf0.001 must exercise at least one match")
  }
}
