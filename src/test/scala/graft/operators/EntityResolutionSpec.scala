package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[EntityResolution]] (X137) oracles: planted listings resolve to
  * the hand-drawn entities — including a TRANSITIVE chain where the
  * endpoints share no token — blocking keys keep different brands
  * apart, and the full sf0.001 catalog matches a driver-side
  * union-find replay exactly.
  */
class EntityResolutionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String, String)]) = {
    val dir = tmpDir("entres")
    rows.toDF("p_partkey", "p_name", "p_brand", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    EntityResolution.q178.build(spark, dir).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("entity_id"), r.getAs[Long]("entity_size"),
          r.getAs[Boolean]("is_canonical"))).toMap
  }

  test("planted catalog: transitive chain merges, brands block, " +
      "singletons stand alone") {
    val out = run(Seq(
      (1L, "red widget", "B1", "T1"),
      (2L, "red bolt", "B1", "T1"),    // shares 'red' with 1
      (3L, "blue widget", "B1", "T1"), // shares 'widget' with 1, NOT 2
      (4L, "red widget", "B2", "T1"),  // same name, different brand
      (5L, "green gear", "B1", "T1"))) // no shared token
    // {1,2,3} one entity via transitivity, canonical = min id
    assert(out(1L) === ((1L, 3L, true)))
    assert(out(2L) === ((1L, 3L, false)))
    assert(out(3L) === ((1L, 3L, false)))
    assert(out(4L) === ((4L, 1L, true)), "blocking must keep B2 apart")
    assert(out(5L) === ((5L, 1L, true)))
  }

  private def runCapped(rows: Seq[(Long, String, String, String)]) = {
    val dir = tmpDir("entres-cap")
    rows.toDF("p_partkey", "p_name", "p_brand", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    EntityResolution.q183.build(spark, dir).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("entity_id"), r.getAs[Long]("capped_size"),
          r.getAs[Boolean]("overflow"))).toMap
  }

  test("entity-size cap (r16, VERDICT r15 item 5): an over-cap " +
      "generic-token cluster is REFUSED — members revert to " +
      "singletons flagged overflow=true — while a legit small entity " +
      "merges unflagged") {
    val n = EntityResolution.MaxEntitySize + 3 // 15 listings, one token
    val generic = (1L to n.toLong).map(i =>
      (i, s"pro$i edition", "B1", "T1")) // 'edition' chains them all
    val legit = Seq(
      (100L, "red widget", "B2", "T1"),
      (101L, "red bolt", "B2", "T1"))
    val out = runCapped(generic ++ legit)
    generic.foreach { case (id, _, _, _) =>
      assert(out(id) === ((id, 1L, true)),
        s"listing $id of the over-cap cluster must revert to a " +
          "flagged singleton")
    }
    assert(out(100L) === ((100L, 2L, false)))
    assert(out(101L) === ((100L, 2L, false)))
  }

  test("empty tokens from doubled spaces are NOT match keys " +
      "(ADVICE r15)") {
    val out = run(Seq(
      (1L, "alpha  beta", "B1", "T1"), // doubled space → empty token
      (2L, "gamma  delta", "B1", "T1"),
      (3L, "alpha omega", "B1", "T1")))
    assert(out(1L)._1 === 1L && out(3L)._1 === 1L,
      "real shared token still merges")
    assert(out(2L) === ((2L, 1L, true)),
      "an empty token must not merge otherwise-disjoint names")
  }

  test("q178 at sf0.001 == driver-side union-find replay") {
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .selectExpr("p_partkey", "p_name", "p_brand", "p_type").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1),
        r.getString(2), r.getString(3)))
    // brute-force edges: same (brand, type), >=1 shared token
    val parent = scala.collection.mutable.Map(
      parts.map(p => p._1 -> p._1).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parts.groupBy(p => (p._3, p._4)).foreach { case (_, block) =>
      for (i <- block.indices; j <- (i + 1) until block.length) {
        val ta = block(i)._2.split(" ").toSet
        val tb = block(j)._2.split(" ").toSet
        if ((ta & tb).nonEmpty) union(block(i)._1, block(j)._1)
      }
    }
    val entity = parts.map(p => p._1 -> find(p._1)).toMap
    val sizes = entity.values.groupBy(identity).map {
      case (e, xs) => e -> xs.size.toLong
    }
    val got = EntityResolution.q178.build(spark, sf0001).collect()
    assert(got.length === parts.length)
    got.foreach { r =>
      val k = r.getAs[Long]("p_partkey")
      assert(r.getAs[Long]("entity_id") === entity(k), s"part $k label")
      assert(r.getAs[Long]("entity_size") === sizes(entity(k)))
      assert(r.getAs[Boolean]("is_canonical") === (entity(k) == k))
    }
    assert(sizes.values.exists(_ > 1),
      "the real catalog must contain at least one multi-listing entity")
  }
}
