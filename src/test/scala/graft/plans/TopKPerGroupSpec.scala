package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerGroupSpec extends SparkSpec {

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")

  test("matches the window row_number formulation exactly") {
    val native = TopK.perGroup(orders,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toString).sorted
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toString).sorted
    assert(native.toSeq === windowed.toSeq)
  }

  test("plan contains partial + final TopKPerGroupExec around one shuffle") {
    val df = TopK.perGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc), 2)
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    // physical nodes print without the Exec suffix; partial=true below
    // the Exchange, final above it
    assert("TopKPerGroup".r.findAllIn(plan).size === 2, plan)
    assert(plan.contains(", true]") || plan.contains(", true\n") ||
      plan.linesIterator.exists(_.trim.endsWith("true")), plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
  }

  test("k larger than any group returns everything; k=1 returns the max") {
    val tiny = spark.range(10)
      .select((col("id") % 3).as("g"), col("id").as("v"))
    val all = TopK.perGroup(tiny, Seq(col("g")), Seq(col("v")), 100)
    assert(all.count() === 10)
    val top1 = TopK.perGroup(tiny, Seq(col("g")), Seq(col("v").desc), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 === Set((0L, 9L), (1L, 7L), (2L, 8L)))
  }

  test("property: random data with ties matches the window formulation") {
    import org.scalacheck.Gen
    val rows = Gen.listOfN(3000,
      Gen.zip(Gen.chooseNum(0, 40), Gen.chooseNum(0, 25))).sample.get
      .zipWithIndex.map { case ((g, v), i) => (g.toLong, v.toLong, i.toLong) }
    import spark.implicits._
    val df = rows.toDF("g", "v", "id").repartition(7)
    val k = 4
    val native = TopK.perGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id")), k)
      .select("g", "v", "id").collect().map(_.toString).sorted
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("g", "v", "id")
      .collect().map(_.toString).sorted
    assert(native.toSeq === windowed.toSeq)
  }

  test("beyond the partial group cap, rows stream through and stay exact") {
    // one partition with more distinct groups than the 65536 partial cap:
    // overflow rows must pass through unpruned (streamed, not buffered)
    // and the final stage must still produce the exact per-group top-1
    val n = 70000L
    val df = spark.range(2 * n)
      .select((col("id") % n).as("g"), col("id").as("v"))
      .coalesce(1)
    val top = TopK.perGroup(df, Seq(col("g")), Seq(col("v").desc), 1)
    assert(top.count() === n)
    // group g holds rows {g, g+n}; its max is always g+n
    assert(top.filter(col("v") =!= col("g") + n).count() === 0)
  }

  test("partial stage caps per-partition group contributions") {
    // 4 partitions × same single group: final input ≤ 4 × k rows
    val df = spark.range(100000).repartition(4)
      .select(lit(1).as("g"), col("id").as("v"))
    val top = TopK.perGroup(df, Seq(col("g")), Seq(col("v").desc), 5)
    val rows = top.collect().map(_.getLong(1)).sorted.reverse
    assert(rows.toSeq === Seq(99999L, 99998L, 99997L, 99996L, 99995L))
  }
}
