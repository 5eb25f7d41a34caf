package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.SparkSpec
import graft.functions.expressions.{NearestCentroidId, RandomProject, SignLshBuckets, VectorFunctions}

/** Null-element discipline of the fused vector kernels
  * ([[RandomProject]], [[SignLshBuckets]], [[NearestCentroidId]]): a
  * null element inside the input array must null the result — never
  * read undefined data through `getDouble` on a null slot — on BOTH the
  * interpreted eval path (direct `Expression.eval`) and the codegen
  * path (a DataFrame pass, plan-asserted inside whole-stage codegen).
  * Null elements past `dim` are never read and must NOT null the
  * result.
  */
class VectorNullElementSpec extends SparkSpec {

  private val dim = 4
  private val k = 2
  private val planes = Array(1.0, 2.0, 3.0, 4.0, -1.0, -2.0, -3.0, -4.0)
  private val centroids = Array(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0)

  private def arrLit(xs: Seq[Any]) =
    Literal.create(xs, ArrayType(DoubleType, containsNull = true))

  test("eval path: null element nulls all three kernels") {
    val withNull = Seq[Any](1.0, null, 3.0, 4.0)
    assert(RandomProject(arrLit(withNull), planes.toIndexedSeq, k, dim)
      .eval(null) == null)
    assert(SignLshBuckets(arrLit(withNull), planes.toIndexedSeq, 1, 2, dim)
      .eval(null) == null)
    assert(NearestCentroidId(arrLit(withNull), centroids.toIndexedSeq, 2, dim)
      .eval(null) == null)
  }

  test("eval path: null element past dim is never read, result non-null") {
    val tailNull = Seq[Any](1.0, 1.0, 1.0, 1.0, null)
    val p = RandomProject(arrLit(tailNull), planes.toIndexedSeq, k, dim)
      .eval(null)
    assert(p != null)
    val c = NearestCentroidId(arrLit(tailNull), centroids.toIndexedSeq, 2, dim)
      .eval(null)
    assert(c === 0)
  }

  test("codegen path: null element nulls the row, clean rows still compute") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("emb", ArrayType(DoubleType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(1L, Seq[Any](1.0, null, 3.0, 4.0)),
      Row(2L, Seq[Any](1.0, 1.0, 1.0, 1.0)))
    // round-trip through parquet: a LocalRelation would be folded by
    // ConvertToLocalRelation and never reach whole-stage codegen
    val dir = tmpDir("vecnull")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(org.apache.spark.sql.functions.col("id"),
        VectorFunctions.randomProject(
          org.apache.spark.sql.functions.col("emb"), planes, k, dim).as("p"),
        VectorFunctions.nearestCentroidId(
          org.apache.spark.sql.functions.col("emb"), centroids, 2, dim).as("c"),
        VectorFunctions.signLshBuckets(
          org.apache.spark.sql.functions.col("emb"), planes, 1, 2, dim).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_random_project") && l.trim.startsWith("*")),
      s"kernels fenced out of whole-stage codegen:\n$plan")
    val out = df.orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2) && out(0).isNullAt(3),
      s"null-element row must null every kernel, got ${out(0)}")
    assert(!out(1).isNullAt(1) && !out(1).isNullAt(2) && !out(1).isNullAt(3))
    // clean-row values match a driver-side fold
    val p = out(1).getSeq[Double](1)
    assert(p === Seq(1.0 + 2.0 + 3.0 + 4.0, -1.0 - 2.0 - 3.0 - 4.0))
    assert(out(1).getInt(2) === 0)
  }
}
