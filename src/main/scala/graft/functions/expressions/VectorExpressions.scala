package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native sequential dot product over two ArrayType(DoubleType) columns.
  *
  * The composable form `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates
  * an intermediate array and runs the fold through interpreted lambda
  * plumbing per row. This expression generates a single fused Java loop
  * (no allocation, no virtual calls) via doGenCode, and its interpreted
  * eval matches the same strict left-to-right accumulation order — so
  * results are bit-identical to the fold and to DuckDB's list_reduce
  * mirror (the oracle-parity requirement from Q.scala).
  *
  * Null handling: null input array → null; null element → skipped pair
  * (embeddings are non-null in practice; skipping keeps eval total).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i))
        acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two array<tinyint> columns (the int8
  * coarse-pass kernel of two-stage ANN): Σ aᵢ·bᵢ as a long, one fused
  * byte loop. The composable alternative — `transform` each tinyint
  * array to double then [[DotProduct]] — is a CodegenFallback
  * higher-order chain in the hottest loop of the coarse pass; this is
  * exact integer math (no accumulation-order concerns at all).
  */
case class TinyDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tinydot expects array<tinyint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i))
        acc += xs.getByte(i).toLong * ys.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TinyDot =
    copy(left = newLeft, right = newRight)
}

/** Shared null discipline for the fused vector kernels below
  * ([[SignLshBuckets]], [[NearestCentroidId]], [[RandomProject]]): a
  * null ELEMENT in the input array nulls the result — mirroring
  * [[WordFingerprint]]'s fold propagation — instead of reading
  * undefined data through `getDouble` on a null slot. Only the first
  * `min(numElements, dim)` slots are scanned: slots past `dim` are
  * never read, so their nullness cannot affect the result. The codegen
  * scan (and the nullable bit) is emitted only when the schema says
  * elements can actually be null, so `containsNull=false` inputs pay
  * nothing.
  */
trait NullSafeVectorKernel { self: UnaryExpression =>

  protected def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  // the result can be null when an ELEMENT is null, not only when the
  // array itself is (see WordFingerprint for the codegen consequence)
  override def nullable: Boolean = child.nullable || elementsNullable

  /** Eval-path scan: true iff a null element exists in the first `n`
    * slots (constant false when the schema forbids null elements).
    */
  protected def hasNullElement(v: ArrayData, n: Int): Boolean = {
    if (elementsNullable) {
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return true
        i += 1
      }
    }
    false
  }

  /** Codegen-path scan: wraps `body` (which assigns ev.value) so a null
    * element in the first `n` slots of `a` sets ev.isNull instead.
    * `ev.isNull` is the literal `false` when nullable=false, so the
    * branch is emitted only when elements can actually be null.
    */
  protected def guardNullElements(ctx: CodegenContext, ev: ExprCode,
      a: String, n: String, body: String): String =
    if (!elementsNullable) body
    else {
      val i = ctx.freshName("ni")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  $body
         |}
       """.stripMargin
    }
}

/** All sign-LSH table buckets of an embedding in one fused pass.
  *
  * The composable form — one `array(lit...)` plane literal plus a
  * [[DotProduct]] per (table, bit) — builds a plan tree of
  * tables×bits×dim literal nodes (4096 for 16×4×64). The tree itself
  * becomes the bottleneck: every analyzer pass, AQE re-optimization, and
  * codegen walk is O(tree), and profiling showed CheckAnalysis alone
  * burning tens of seconds per query on it. Here the plane matrix is a
  * single flat `double[]` reference object and the whole bucket
  * computation is three tight loops; the plan node count is constant.
  *
  * Returns array<int> of length `tables`: element t = the `bits`-bit
  * bucket of hyperplane table t (bit j set iff plane (t,j) · emb > 0).
  */
case class SignLshBuckets(child: Expression, planes: Seq[Double],
    tables: Int, bits: Int, dim: Int)
    extends UnaryExpression with NullSafeVectorKernel {

  // Seq field (not Array): array equality is by reference, which would
  // make semanticEquals/canonicalization never match two logically
  // identical instances, defeating subexpression elimination. The flat
  // primitive array for the hot loops is derived lazily.
  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def compute(v: ArrayData): Array[Int] = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var acc = 0d
        var i = 0
        while (i < n) { acc += planesArr(base + i) * v.getDouble(i); i += 1 }
        if (acc > 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (hasNullElement(v, math.min(v.numElements(), dim))) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(compute(v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planesArr, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val base = ctx.freshName("base")
      val body =
        s"""
           |int[] $out = new int[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  int $bucket = 0;
           |  for (int $j = 0; $j < $bits; $j++) {
           |    int $base = ($t * $bits + $j) * $dim;
           |    double $acc = 0.0;
           |    for (int $i = 0; $i < $n; $i++) {
           |      $acc += $p[$base + $i] * $a.getDouble($i);
           |    }
           |    if ($acc > 0) $bucket |= (1 << $j);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($out);
         """.stripMargin
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |${guardNullElements(ctx, ev, a, n, body)}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SignLshBuckets =
    copy(child = c)
}

/** Nearest-centroid id (squared-L2 argmin, lowest index wins ties) over a
  * flat centroid matrix reference — the IVF cell assignment as one fused
  * loop instead of an `array(argmin over nlist dot-expressions)` tree.
  */
case class NearestCentroidId(child: Expression, centroids: Seq[Double],
    cells: Int, dim: Int)
    extends UnaryExpression with NullSafeVectorKernel {

  // Seq field for content equality (see SignLshBuckets note)
  @transient private lazy val centroidsArr: Array[Double] = centroids.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    if (hasNullElement(v, n)) return null
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cells) {
      var d = 0d
      var i = 0
      while (i < n) {
        val diff = v.getDouble(i) - centroidsArr(c * dim + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs = ctx.addReferenceObj("centroids", centroidsArr, "double[]")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      val body =
        s"""
           |int $best = 0;
           |double $bestD = Double.MAX_VALUE;
           |for (int $c = 0; $c < $cells; $c++) {
           |  double $d = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $diff = $a.getDouble($i) - $cs[$c * $dim + $i];
           |    $d += $diff * $diff;
           |  }
           |  if ($d < $bestD) { $bestD = $d; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |${guardNullElements(ctx, ev, a, n, body)}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NearestCentroidId =
    copy(child = c)
}

/** Random projection to `k` dimensions over a flat row-major plane
  * matrix — the Johnson–Lindenstrauss dimensionality reduction a
  * similarity tier runs before storing or indexing embeddings (k·dim
  * multiply-adds per row, one fused loop, no per-row allocation beyond
  * the output array). Same reference-object discipline as
  * [[SignLshBuckets]]: the matrix is ONE codegen reference, not k×dim
  * literal plan nodes. Accumulation order is ascending i, so the result
  * is bit-identical to a sequential fold (and to DuckDB's list_reduce —
  * the q89 oracle depends on this).
  */
case class RandomProject(child: Expression, planes: Seq[Double],
    k: Int, dim: Int)
    extends UnaryExpression with NullSafeVectorKernel {

  // Seq field for content equality (see SignLshBuckets note)
  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_random_project expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def compute(v: ArrayData): Array[Double] = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val base = j * dim
      var acc = 0d
      var i = 0
      while (i < n) { acc += planesArr(base + i) * v.getDouble(i); i += 1 }
      out(j) = acc
      j += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (hasNullElement(v, math.min(v.numElements(), dim))) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(compute(v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planesArr, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val body =
        s"""
           |double[] $out = new double[$k];
           |for (int $j = 0; $j < $k; $j++) {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += $p[$j * $dim + $i] * $a.getDouble($i);
           |  }
           |  $out[$j] = $acc;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($out);
         """.stripMargin
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |${guardNullElements(ctx, ev, a, n, body)}
       """.stripMargin
    })

  override def prettyName: String = "graft_random_project"

  override protected def withNewChildInternal(c: Expression): RandomProject =
    copy(child = c)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Squared L2 norm via the same fused loop. */
  def sqNorm(a: Column): Column = dot(a, a)

  /** Column API for [[TinyDot]] — exact int8 dot as long. */
  def tinyDot(a: Column, b: Column): Column =
    Bridge.column(TinyDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[SignLshBuckets]] — planes flattened t-major. */
  def signLshBuckets(emb: Column, planes: Array[Double], tables: Int,
      bits: Int, dim: Int): Column =
    Bridge.column(SignLshBuckets(Bridge.expression(emb), planes.toIndexedSeq,
      tables, bits, dim))

  /** Column API for [[NearestCentroidId]] — centroids flattened c-major. */
  def nearestCentroidId(emb: Column, centroids: Array[Double], cells: Int,
      dim: Int): Column =
    Bridge.column(NearestCentroidId(Bridge.expression(emb),
      centroids.toIndexedSeq, cells, dim))

  /** Column API for [[RandomProject]] — planes flattened row-major. */
  def randomProject(emb: Column, planes: Array[Double], k: Int,
      dim: Int): Column =
    Bridge.column(RandomProject(Bridge.expression(emb),
      planes.toIndexedSeq, k, dim))
}
