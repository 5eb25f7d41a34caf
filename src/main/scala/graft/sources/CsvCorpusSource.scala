package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Labeled ABSA corpus CSV source (S2, FIXTURES §2): `Review` text + 8
  * aspect labels ∈ {-1,0,1,2}. Schema is declared, never inferred — one
  * pass over the file, exact types, malformed rows to a corrupt-record
  * column instead of silent nulls.
  */
object CsvCorpusSource {

  val aspectCols: Seq[String] = graft.functions.MockScorers.aspects

  val schema: StructType = StructType(
    StructField("Review", StringType) +:
      aspectCols.map(a => StructField(a, IntegerType)) :+
      StructField("_corrupt", StringType))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(path)

  /** Reference label mapping {-1:0, 0:1, 1:2, 2:3}
    * (`train_retrain.py:149-153`) applied to every aspect column.
    */
  def withMappedLabels(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    aspectCols.foldLeft(df)((acc, a) =>
      acc.withColumn(s"${a}_class", col(a) + 1))
  }
}
