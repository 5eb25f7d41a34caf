package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable backward as-of join (X11) — the library API behind q32's
  * query-level formulation.
  *
  * For every left row, picks the latest right row with
  * `right.time <= left.time` for the same key. Spark-first shape: tag +
  * union both sides, ONE window pass per key carrying
  * `last(rightValues, ignoreNulls)` — a single shuffle, no row
  * explosion, no range join. This is the merge-join shape an as-of join
  * compiles to at any scale; at 100 TB both sides shuffle exactly once
  * on the key and stream through the window in sorted order.
  *
  * Ties: right rows sort BEFORE left rows at equal time (at-or-before
  * inclusive). Among right rows with identical (key, time), pass
  * `rightTieBreak` columns to make last-wins deterministic (the row
  * greatest in tiebreak order wins).
  *
  * Null keys follow equi-join semantics: a null-key left row gets null
  * as-of values (never matched against null-key right rows, which a
  * naive window partitioning would group together).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVals: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.toSeq
    val rvStruct = struct(rightVals.map(col): _*)
    val rvType = right.select(rvStruct.as("s")).schema("s").dataType
    val lrowType = left
      .select(struct(lCols.map(col): _*).as("s")).schema("s").dataType
    val tbNames = rightTieBreak.zipWithIndex.map { case (_, i) => s"__tb$i" }

    def side(df: DataFrame, time: String, tag: Int,
        lrow: Column, rv: Column, tbs: Seq[Column]): DataFrame =
      df.select(Seq(col(key).as("__k"), col(time).as("__t"),
        lit(tag).as("__tag"), lrow.as("__lrow"), rv.as("__rv")) ++
        tbs.zip(tbNames).map { case (c, n) => c.as(n) }: _*)

    val lTagged = side(left, leftTime, tag = 1,
      struct(lCols.map(col): _*), lit(null).cast(rvType),
      rightTieBreak.map(c => lit(null).cast(right.schema(c).dataType)))
    // equi-join semantics for null keys: drop null-key RIGHT rows so a
    // null-key left row (they all land in the null window partition)
    // reads last(null) = null instead of matching another null key
    val rTagged = side(right.filter(col(key).isNotNull), rightTime,
      tag = 0, lit(null).cast(lrowType), rvStruct, rightTieBreak.map(col))

    val w = Window.partitionBy(col("__k"))
      .orderBy(Seq(col("__t"), col("__tag")) ++ tbNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.union(lTagged)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(c => col("__lrow").getField(c).as(c)) ++
        rightVals.map(c => col("__asof").getField(c).as(prefix + c)): _*)
  }
}
