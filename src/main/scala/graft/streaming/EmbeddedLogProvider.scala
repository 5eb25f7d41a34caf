package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming DSv2 connector over [[EmbeddedLog]] — the
  * engine's first full custom `MicroBatchStream`, implementing the
  * Kafka source CONTRACT (schema, per-partition offsets, checkpoint
  * recovery, proportional `maxRecordsPerTrigger` admission control) so
  * the S1/S28 semantics execute for real in-sandbox:
  *
  * {{{
  * spark.readStream
  *   .format(classOf[EmbeddedLogProvider].getName)
  *   .option("topic", "reviews")
  *   .option("startingOffsets", "earliest")   // or "latest"
  *   .option("maxRecordsPerTrigger", "50")    // maxOffsetsPerTrigger
  *   .load()
  * }}}
  *
  * Offsets are per-partition end positions serialized as a JSON array
  * into the streaming checkpoint — after a kill, the next run resumes
  * from the COMMITTED array exactly like the Kafka source resumes from
  * committed topic-partition offsets (KafkaSemanticsSpec proves the
  * replayed batch + idempotent JDBC upsert path end to end).
  *
  * Scale shape: one [[InputPartition]] per topic partition — the
  * natural Kafka parallelism — and admission control splits the rate
  * cap across partitions proportionally to backlog, which is the
  * documented connector behavior for `maxOffsetsPerTrigger`.
  */
final class EmbeddedLogProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EmbeddedLogProvider.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive with ORIGINAL key case (asCaseSensitiveMap);
    // re-wrap so user-facing camelCase options resolve
    val opts = new CaseInsensitiveStringMap(properties)
    new EmbeddedLogTable(opts.get("topic"),
      Option(opts.get("startingOffsets")).getOrElse("earliest"),
      Option(opts.get("maxRecordsPerTrigger")).map(_.toLong))
  }
}

object EmbeddedLogProvider {
  /** The Kafka source schema (minus Kafka's timestampType/headers),
    * so [[AbsaPipeline.parse]]'s `CAST(value AS STRING)` contract runs
    * unchanged.
    */
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))
}

private final class EmbeddedLogTable(topic: String, startingOffsets: String,
    maxRecordsPerTrigger: Option[Long]) extends Table with SupportsRead {
  require(topic != null, "option 'topic' is required")

  override def name(): String = s"embedded-log:$topic"
  override def schema(): StructType = EmbeddedLogProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = EmbeddedLogProvider.Schema
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new EmbeddedLogMicroBatchStream(topic, startingOffsets,
            maxRecordsPerTrigger)
      }
    }
}

/** Per-partition end offsets — the stream's checkpointable position. */
private[streaming] final case class EmbeddedLogOffset(ends: Array[Long])
    extends Offset {
  override def json(): String = ends.mkString("[", ",", "]")
}

private[streaming] object EmbeddedLogOffset {
  def fromJson(s: String): EmbeddedLogOffset = {
    val body = s.trim.stripPrefix("[").stripSuffix("]").trim
    EmbeddedLogOffset(
      if (body.isEmpty) Array.empty[Long]
      else body.split(",").map(_.trim.toLong))
  }
}

private final class EmbeddedLogMicroBatchStream(topic: String,
    startingOffsets: String, maxRecordsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow contract: snapshot the log's end at prepare
  // time; every later admission decision is clamped to the snapshot so
  // the run drains exactly the prepared range (in capped batches) and
  // stops — records produced after prepare wait for the next run.
  @volatile private var availableNowCap: Option[Array[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(EmbeddedLog.endOffsets(topic))

  override def initialOffset(): Offset = startingOffsets match {
    case "latest" => EmbeddedLogOffset(EmbeddedLog.endOffsets(topic))
    case "earliest" =>
      EmbeddedLogOffset(Array.fill(EmbeddedLog.numPartitions(topic))(0L))
    case other =>
      throw new IllegalArgumentException(
        s"startingOffsets must be earliest|latest, got: $other")
  }

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(ReadLimit.maxRows).getOrElse(
      ReadLimit.allAvailable())

  /** Admission control: cap total admitted records at the limit, split
    * across partitions PROPORTIONALLY to backlog (the Kafka
    * `maxOffsetsPerTrigger` behavior), remainder to the lowest
    * partition ids — deterministic for the spec's batch-count asserts.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[EmbeddedLogOffset].ends
    val live = EmbeddedLog.endOffsets(topic)
    val ends = availableNowCap match {
      case Some(cap) => live.indices.map(i => math.min(live(i), cap(i))).toArray
      case None => live
    }
    limit match {
      case _: ReadAllAvailable => EmbeddedLogOffset(ends)
      case m: ReadMaxRows =>
        val backlog = ends.indices.map(i => ends(i) - from(i))
        val total = backlog.sum
        val cap = m.maxRows()
        if (total <= cap) EmbeddedLogOffset(ends)
        else {
          val granted = backlog.map(b => b * cap / total).toArray
          var left = cap - granted.sum
          var i = 0
          while (left > 0 && i < granted.length) {
            val room = backlog(i) - granted(i)
            val take = math.min(room, left)
            granted(i) += take
            left -= take
            i += 1
          }
          EmbeddedLogOffset(
            ends.indices.map(i => from(i) + granted(i)).toArray)
        }
      case _ => EmbeddedLogOffset(ends) // composite limits: admit all
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset =
    EmbeddedLogOffset(EmbeddedLog.endOffsets(topic))

  override def deserializeOffset(json: String): Offset =
    EmbeddedLogOffset.fromJson(json)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EmbeddedLogOffset].ends
    val e = end.asInstanceOf[EmbeddedLogOffset].ends
    s.indices.map(i =>
      EmbeddedLogInputPartition(topic, i, s(i), e(i))
        : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EmbeddedLogReaderFactory

  override def commit(end: Offset): Unit = () // log retention is a no-op
  override def stop(): Unit = ()
}

private[streaming] final case class EmbeddedLogInputPartition(topic: String,
    pid: Int, from: Long, until: Long) extends InputPartition

private final class EmbeddedLogReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EmbeddedLogInputPartition]
    // registry read: same-JVM in local[*] — the deployment seam
    // documented on EmbeddedLog (a cluster uses the kafka connector)
    val records = EmbeddedLog.slice(p.topic, p.pid, p.from, p.until)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < records.length }
      override def get(): InternalRow = {
        val r = records(i)
        InternalRow(r.key, r.value, UTF8String.fromString(p.topic),
          p.pid, p.from + i, r.tsMillis * 1000L)
      }
      override def close(): Unit = ()
    }
  }
}
