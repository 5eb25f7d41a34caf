package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** X113 — the quantile sketch as a FIRST-CLASS MERGEABLE COLUMN: a
  * `TypedImperativeAggregate` over Spark's own Greenwald–Khanna
  * summary (`QuantileSummaries` — the engine under
  * `approx_percentile`/`approxQuantile`), evaluating to a SERIALIZED
  * sketch so the state itself can be stored, shipped, and re-merged —
  * the X45 `hll_union_agg` pattern for quantiles. This is the
  * unknown-bounds histogram path X100's frozen grid documents as its
  * caveat: the grid needs [lo, hi) a priori and its resolution is one
  * cell width; a GK sketch needs nothing a priori and bounds RANK
  * error at ε·n (Greenwald & Khanna, SIGMOD'01; merge per Spark's
  * implementation of the Greenwald–Khanna merge used by approxQuantile).
  *
  * Built-in `approx_percentile` only returns final quantiles — the
  * sketch dies inside the aggregation. Here the sketch IS the column:
  * [[GkSketchAgg]] builds one from raw values, [[GkMergeAgg]] unions
  * stored sketches, and reads query any quantile vector off the
  * ≤O((1/ε)·log εN) state. Deterministic end to end (GK compaction has
  * no randomness), so a replayed build is byte-identical — unlike HLL
  * union (the r12 lesson), sliced-merge vs one-shot sketches may
  * STRUCTURALLY differ but both carry the ε·n guarantee, which is what
  * the spec asserts.
  */
object GkQuantileSketch {

  /** Default relative rank error (matches the q148 GK swap). */
  val DefaultEps = 1e-4

  def empty(eps: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps,
      Array.empty, 0L, true)

  /** Flat binary layout: eps, compressThreshold, count, |sampled|,
    * then (value, g, delta) triples — no JVM serialization, so the
    * stored state is stable across Spark versions.
    */
  def serialize(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeDouble(qs.relativeError)
    out.writeInt(qs.compressThreshold)
    out.writeLong(qs.count)
    out.writeInt(qs.sampled.length)
    qs.sampled.foreach { st =>
      out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val eps = in.readDouble()
    val ct = in.readInt()
    val n = in.readLong()
    val sampled = Array.fill(in.readInt())(
      QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong()))
    new QuantileSummaries(ct, eps, sampled, n, true)
  }

  def mergeSummaries(a: QuantileSummaries,
      b: QuantileSummaries): QuantileSummaries = {
    val ac = a.compress(); val bc = b.compress()
    if (ac.count == 0) bc else if (bc.count == 0) ac else ac.merge(bc)
  }

  /** Quantiles off a serialized sketch (driver-side read path — the
    * state frame is one row; empty sketch → empty vector).
    */
  def query(bytes: Array[Byte], probs: Seq[Double]): Array[Double] = {
    val qs = deserialize(bytes)
    if (qs.count == 0) Array.empty
    else probs.map(p => qs.query(p).get).toArray
  }

  def rowCount(bytes: Array[Byte]): Long = deserialize(bytes).count

  /** Aggregate raw numeric values into one serialized GK sketch. */
  def sketchAgg(c: Column, eps: Double = DefaultEps): Column =
    Bridge.column(
      GkSketchAgg(Bridge.expression(c), eps).toAggregateExpression())

  /** Union stored (binary) sketches — the `hll_union_agg` analogue. */
  def mergeAgg(c: Column): Column =
    Bridge.column(GkMergeAgg(Bridge.expression(c)).toAggregateExpression())
}

/** Build a GK sketch from a numeric column; evaluates to the
  * serialized sketch bytes. The in-memory buffer is the live
  * `QuantileSummaries`; serialization happens only at shuffle/eval
  * boundaries (the TypedImperativeAggregate contract), so partial
  * aggregation ships O((1/ε)·log εN) bytes per partition, never rows.
  */
case class GkSketchAgg(child: Expression, eps: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): QuantileSummaries =
    GkQuantileSketch.empty(eps)

  override def update(buffer: QuantileSummaries,
      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.insert(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: Decimal => d.toDouble
      case o => throw new IllegalArgumentException(
        s"gk_sketch_agg: non-numeric input ${o.getClass}")
    })
  }

  override def merge(a: QuantileSummaries,
      b: QuantileSummaries): QuantileSummaries =
    GkQuantileSketch.mergeSummaries(a, b)

  override def eval(buffer: QuantileSummaries): Any =
    GkQuantileSketch.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    GkQuantileSketch.serialize(buffer)

  override def deserialize(storage: Array[Byte]): QuantileSummaries =
    GkQuantileSketch.deserialize(storage)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): GkSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GkSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(nc: Expression): GkSketchAgg =
    copy(child = nc)
  override def prettyName: String = "gk_sketch_agg"
}

/** Union serialized GK sketches stored in a binary column. */
case class GkMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): QuantileSummaries =
    GkQuantileSketch.empty(GkQuantileSketch.DefaultEps)

  override def update(buffer: QuantileSummaries,
      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else GkQuantileSketch.mergeSummaries(buffer,
      GkQuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: QuantileSummaries,
      b: QuantileSummaries): QuantileSummaries =
    GkQuantileSketch.mergeSummaries(a, b)

  override def eval(buffer: QuantileSummaries): Any =
    GkQuantileSketch.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    GkQuantileSketch.serialize(buffer)

  override def deserialize(storage: Array[Byte]): QuantileSummaries =
    GkQuantileSketch.deserialize(storage)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): GkMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GkMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(nc: Expression): GkMergeAgg =
    copy(child = nc)
  override def prettyName: String = "gk_merge_agg"
}
