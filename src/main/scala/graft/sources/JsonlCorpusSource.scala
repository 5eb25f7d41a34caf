package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JSONL document-corpus source (S2's sibling for the format LLM corpus
  * dumps actually arrive in: one JSON object per line — crawl shards,
  * Common-Crawl-style exports, eval sets).
  *
  * Same contract as [[CsvCorpusSource]]: the schema is DECLARED, never
  * inferred — inference would cost a full extra pass over 100 TB and
  * can silently widen types between shards; a declared schema makes the
  * read one pass with exact types. Malformed lines land in a corrupt-
  * record column instead of killing the job or disappearing (at corpus
  * scale there are ALWAYS broken lines; dropping them silently skews
  * the corpus, failing on them loses the shard). JSONL is line-
  * splittable, so a 100 TB directory parallelizes by file split with no
  * coordination.
  */
object JsonlCorpusSource {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("url", StringType),
    StructField("fetched_at", TimestampType),
    StructField("_corrupt", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .json(path)

  /** Rows usable downstream: parsed clean AND carrying the two fields
    * every pipeline stage keys on. (A line can parse yet miss doc_id —
    * PERMISSIVE yields nulls, not errors, for absent fields.)
    */
  def valid(df: DataFrame): DataFrame =
    df.filter(col("_corrupt").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .drop("_corrupt")

  /** The reject stream: raw corrupt lines plus parsed-but-unkeyed rows,
    * kept for quarantine/inspection (the graceful-degradation pattern
    * S31 applies to sinks, applied to the source side).
    *
    * Spark restriction: a query may not project ONLY the corrupt column
    * from a raw file scan (SPARK-21610) — keep at least one data column
    * in downstream selects, or cache the parsed frame first.
    */
  def rejects(df: DataFrame): DataFrame =
    df.filter(col("_corrupt").isNotNull ||
      col("doc_id").isNull || col("text").isNull)
}
