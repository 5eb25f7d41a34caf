package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided TPC-H-ish star schema + stream tables
  * (TESTDATA.md). One parquet file per table under the scale-factor dir.
  *
  * All reads go through `spark.read.parquet` so Catalyst predicate pushdown
  * and column pruning reach the scan (`PushedFilters`/`ReadSchema` in
  * `.explain`); callers select/filter lazily and never materialize here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Current testdata timestamps are TIMESTAMP(MICROS); sessions set
    // inferTimestampNTZ=false so they scan directly as session-tz (UTC)
    // TIMESTAMP — no conversion, filters still push down. Older testdata
    // generations carried events.ts as TIMESTAMP(NANOS), which Spark
    // refuses natively; sessions set spark.sql.legacy.parquet.nanosAsLong
    // so those arrive as LongType nanos. Truncate to micros with exact
    // integer division (`div` — a double division would lose precision
    // above 2^53) to match DuckDB's us-precision read of the same file.
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
