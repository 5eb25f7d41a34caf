package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** One oracle-checked query: a Spark builder plus (optionally) the
  * equivalent DuckDB SQL the driver runs for the t2 correctness gate.
  * Queries without SQL (sketches, LSH, …) get a rows-only check and a
  * ScalaTest oracle instead.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared helpers for the query suite.
  *
  * Cross-engine determinism rules (Spark vs DuckDB 1.0, see SURVEY §5.2):
  *   - Never hash-compare a naively summed DOUBLE: sum order differs across
  *     engines/partitionings. Sum in DECIMAL(18,2) (exact, associative) and
  *     cast the final value to DOUBLE — `dsum`.
  *   - Averages = exact decimal sum / count in one double division.
  *   - Every query ends in a total ORDER BY so row order is identical.
  *   - DuckDB counts/length return BIGINT vs Spark's INT where noted; the
  *     oracle SQL casts to match Spark's schema.
  */
object Q {
  def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Exact, order-insensitive sum of a monetary/quantity double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Cast a RAW 2-decimal column to exact decimal. Only raw columns: a
    * computed double cast to decimal can land on a .xx5 rounding tie whose
    * direction differs between Spark (HALF_UP on the exact binary value)
    * and DuckDB (round on the scaled double) — multiply decimals instead.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact revenue sum: extendedprice * (1 - discount) in decimal. */
  def discSum(price: Column, discount: Column): Column =
    sum(dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(discount)))
      .cast("double")

  /** Exact average: decimal sum over count, single double division. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))).as("avg")

  /** Epoch-day bucket of a timestamp — THE shared day-key idiom of the
    * daily-series operators (q246/q248/q252/q255), mirrored in DuckDB
    * as `CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400`.
    * floor() (not a truncating cast) matches DuckDB's `//` floor
    * division on negative epochs too (ADVICE r18); under the suite's
    * UTC session the truncated midnight is an exact 86400-multiple, so
    * the division is exact and floor == trunc for ALL post-1970 data —
    * the floor only matters pre-1970. NOTE: day-of-week derivations
    * (`pmod(day, 7)`, dow 0 = Thursday — the q238 convention) still
    * assume post-1970 data: Spark's pmod is non-negative where
    * DuckDB's % follows the dividend sign, so a pre-1970 dow needs a
    * pmod-style oracle mirror.
    */
  def epochDay(ts: Column): Column =
    floor(unix_timestamp(date_trunc("day", ts)) / lit(86400.0d))
      .cast("long")
}

/** Session-scoped scratch root for queries whose CONTRACT includes
  * materializing a table (q147/q154/q157/q177/q181/q182): one per-JVM
  * temp root removed recursively on JVM exit, and [[fresh]] wipes the
  * per-query subdirectory before handing it out — so repeated bench
  * invocations (3 per round, plus reruns) REUSE disk instead of
  * accumulating an unbounded trail of `createTempDirectory` orphans
  * (ADVICE r15).
  */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r)))
    r
  }

  private def delete(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(c => delete(c)) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  /** A clean scratch directory for `name`, wiping whatever a previous
    * invocation of the same query left behind.
    */
  def fresh(name: String): String = {
    val d = root.resolve(name)
    delete(d)
    d.toString
  }
}
