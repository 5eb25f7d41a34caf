package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.3 X3): most-frequent value with a
  * deterministic tiebreak (higher count wins; equal counts → lexically
  * smallest value), as an `Aggregator[IN, BUF, OUT]`.
  *
  * The buffer is a count map — partial aggregation merges maps, so the
  * shuffle carries one (value → count) map per partition per group, not
  * rows (map-side combine preserved). Suitable for low-cardinality value
  * domains (vehicle classes, sentiment labels); high-cardinality mode
  * would switch to a sketch.
  */
object ModeAggregator extends Aggregator[String, Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) b else b.updated(v, b.getOrElse(v, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, n)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + n)
    }

  override def finish(b: Map[String, Long]): String =
    if (b.isEmpty) null
    else b.toSeq.minBy { case (v, n) => (-n, v) }._1

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** DataFrame-API column: groupBy(...).agg(mode_of(col)). */
  def modeOf(c: Column): Column = udaf(ModeAggregator).apply(c)
}
