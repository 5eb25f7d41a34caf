package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

import graft.SparkSpec
import graft.functions.expressions.VectorFunctions

class QuantizeSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("int8 round trip preserves cosine to 3 decimals; storage is tinyint") {
    val q = emb.withColumn("qs", Quantize.quantize(col("emb")))
    // schema: the quantized components must be BYTES, not doubles — the
    // whole point is the 8x narrower column
    assert(q.schema("qs").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("q")
      .dataType.asInstanceOf[ArrayType].elementType === ByteType)
    val fidelity = q
      .withColumn("deq", Quantize.dequantize(col("qs")))
      .select(
        (VectorFunctions.dot(col("emb"), col("deq")) /
          (sqrt(VectorFunctions.sqNorm(col("emb"))) *
            sqrt(VectorFunctions.sqNorm(col("deq"))))).as("cos"))
      .agg(min(col("cos"))).first().getDouble(0)
    assert(fidelity > 0.999,
      f"round-trip cosine fidelity too low: $fidelity%.5f")
  }

  test("quantized dot approximates the exact dot within 1%") {
    val a = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("ida"), col("emb").as("ea"),
        Quantize.quantize(col("emb")).as("qa"))
    val b = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .select(col("vec_id").as("idb"), col("emb").as("eb"),
        Quantize.quantize(col("emb")).as("qb"))
    val worst = a.crossJoin(b)
      .select(
        VectorFunctions.dot(col("ea"), col("eb")).as("exact"),
        Quantize.dotQ(col("qa"), col("qb")).as("approx"),
        sqrt(VectorFunctions.sqNorm(col("ea"))).as("na"),
        sqrt(VectorFunctions.sqNorm(col("eb"))).as("nb"))
      // normalize the error by the norms (dot values cluster near 0 for
      // near-orthogonal vectors, so relative-to-dot is ill-posed)
      .select((abs(col("exact") - col("approx")) /
        (col("na") * col("nb"))).as("relerr"))
      .agg(max(col("relerr"))).first().getDouble(0)
    assert(worst < 0.01, f"quantized dot error too high: $worst%.5f")
  }

  test("zero vector quantizes safely") {
    import spark.implicits._
    val z = Seq((1L, Array.fill(8)(0.0))).toDF("vec_id", "emb")
      .withColumn("qs", Quantize.quantize(col("emb")))
      .withColumn("deq", Quantize.dequantize(col("qs")))
      .select(col("deq")).as[Seq[Double]].first()
    assert(z === Seq.fill(8)(0.0))
  }
}
