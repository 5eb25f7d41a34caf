package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator extension (SURVEY §4.2 / builder option (c)): top-k rows
  * per group as a first-class physical operator.
  *
  * The built-in formulation — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — must SORT every group's full row set after the
  * shuffle. This operator keeps a bounded k-row heap per group instead:
  *
  *   - partial stage (map-side, no distribution requirement): per-
  *     partition heaps cap each group's contribution at k rows BEFORE the
  *     shuffle — the top-k analog of partial aggregation; shuffle volume
  *     drops from n rows to ≤ k·groups·partitions;
  *   - final stage (requires clustering by the group keys): merges the
  *     partial winners, O(n log k) with no full sort.
  *
  * At 100 TB this is the difference between shuffling the fact table and
  * shuffling k rows per group per input split.
  */
case class TopKPerGroup(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  // Final stage streams group-at-a-time over input sorted by the group
  // keys: memory is ONE k-row heap regardless of group cardinality, and
  // the sort Spark inserts to satisfy this spills to disk. (The partial
  // stage has already cut the sorted volume to ≤ k·groups per split.)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(groupExprs.map(SortOrder(_, Ascending)))

  override def outputPartitioning = child.outputPartitioning

  /** Partial-stage cap on distinct groups tracked per partition. Beyond
    * it, rows pass through un-pruned — correct (the final stage is
    * exact), just less map-side reduction — bounding partial-stage
    * memory at ~maxPartialGroups·k rows instead of ~all partition rows
    * for high-cardinality keys.
    */
  private val maxPartialGroups = 1 << 16

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    val childOutput = child.output
    val capLocal = maxPartialGroups
    if (partial) {
      child.execute().mapPartitions({ rows =>
        val groupProj = UnsafeProjection.create(groupLocal, childOutput)
        val ordering = RowOrdering.create(orderLocal, childOutput)
        // max-heap on the sort order: head = current worst of the kept k.
        // Rows of groups beyond the cap are STREAMED through as
        // encountered (not buffered): partial-stage memory is exactly
        // ≤ cap·k retained rows no matter the partition's cardinality.
        // Output order is irrelevant — the final stage re-shuffles and
        // sorts. Pass-through rows are emitted without copy: the consumer
        // (shuffle writer) serializes each row before we pull the next.
        new Iterator[InternalRow] {
          private val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
            mutable.PriorityQueue[InternalRow]]
          private var passThrough: InternalRow = _
          private var flushed: Iterator[InternalRow] = _

          private def advance(): Unit = {
            while (passThrough == null && rows.hasNext) {
              val row = rows.next()
              val key = groupProj(row)
              heaps.get(key) match {
                case Some(heap) =>
                  if (heap.size < kLocal) heap += row.copy()
                  else if (ordering.compare(row, heap.head) < 0) {
                    heap.dequeue()
                    heap += row.copy()
                  }
                case None if heaps.size < capLocal =>
                  val h = mutable.PriorityQueue.empty[InternalRow](ordering)
                  h += row.copy()
                  heaps.put(key.copy(), h)
                case None =>
                  passThrough = row // beyond cap: forward unpruned, now
              }
            }
            if (passThrough == null && flushed == null && !rows.hasNext)
              flushed = heaps.valuesIterator
                .flatMap(_.dequeueAll.reverseIterator)
          }

          override def hasNext: Boolean = {
            if (passThrough == null && flushed == null) advance()
            passThrough != null || (flushed != null && flushed.hasNext)
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            if (passThrough != null) {
              val r = passThrough
              passThrough = null
              r
            } else flushed.next()
          }
        }
      }, preservesPartitioning = true)
    } else {
      child.execute().mapPartitions({ rows =>
        val groupProj = UnsafeProjection.create(groupLocal, childOutput)
        val ordering = RowOrdering.create(orderLocal, childOutput)
        new Iterator[InternalRow] {
          private var currentKey: UnsafeRow = _
          private val heap =
            mutable.PriorityQueue.empty[InternalRow](ordering)
          private var pending: Iterator[InternalRow] = Iterator.empty
          private var lookahead: InternalRow = _

          private def fillPending(): Unit = {
            while (pending.isEmpty && (lookahead != null || rows.hasNext)) {
              val row = if (lookahead != null) lookahead else rows.next()
              lookahead = null
              val key = groupProj(row)
              if (currentKey == null) currentKey = key.copy()
              else if (key != currentKey) {
                // group boundary (input is sorted by group): flush
                pending = heap.dequeueAll.reverseIterator
                lookahead = row
                currentKey = null
                return
              }
              if (heap.size < kLocal) heap += row.copy()
              else if (ordering.compare(row, heap.head) < 0) {
                heap.dequeue()
                heap += row.copy()
              }
            }
            if (pending.isEmpty && heap.nonEmpty)
              pending = heap.dequeueAll.reverseIterator
          }

          override def hasNext: Boolean = {
            if (pending.isEmpty) fillPending()
            pending.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            pending.next()
          }
        }
      }, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, group, order, child) =>
      TopKPerGroupExec(k, group, order, partial = false,
        TopKPerGroupExec(k, group, order, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopK {

  private def toSortOrder(c: Column): SortOrder =
    Bridge.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }

  /** Top `k` rows of `df` per distinct value of `groupCols`, ordered by
    * `orderCols` (use `.desc`/`.asc` columns). Requires the
    * TopKPerGroupStrategy to be registered (GraftSession does).
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame =
    // expressions may arrive unresolved (plain col("...")); the analyzer
    // resolves them against the child inside ofRows
    Bridge.ofRows(df.sparkSession,
      TopKPerGroup(k, groupCols.map(Bridge.expression),
        orderCols.map(toSortOrder), Bridge.analyzedPlan(df)))
}
