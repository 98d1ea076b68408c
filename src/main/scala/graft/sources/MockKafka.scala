package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Kafka-WIRE-compatible mock broker as a DataSource V2 table — the test
  * double for the S1/K3 deploy target (reference
  * `spark-streaming.py:269-275`, `dags/crypto_data_streaming.py:179-184`;
  * the sandbox ships no Kafka jars or broker).
  *
  * Read side: a [[MicroBatchStream]] with Kafka's EXACT source schema
  * (key/value binary, topic, partition, offset, timestamp, timestampType)
  * serving one record per line of `lines.dir` — so everything downstream
  * of `load()` (the P1 `CAST(value AS STRING)`, envelope parse, demux,
  * sink) runs the very code a real Kafka deployment runs, and only the
  * format string differs ([[graft.streaming.KafkaPipeline]] parameterizes
  * it). Offsets are line indices; `startingOffsets`/`subscribe` options
  * are accepted like the real source.
  *
  * Write side: BATCH_WRITE appending (key, value, topic) to an in-JVM
  * queue ([[MockKafka.produced]]) with proper two-phase commit (tasks
  * buffer, driver commit publishes) — the producer-sink (K3) contract a
  * `format("kafka")` writer has, testable without a broker.
  */
class MockKafka extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MockKafka.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new MockKafkaTable(new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object MockKafka {
  /** The Kafka source's wire schema, field for field. */
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The in-JVM "broker" the write side publishes to: (key, value, topic).
    * Test-scoped; call [[reset]] between cases. */
  val produced = new ConcurrentLinkedQueue[(Array[Byte], Array[Byte], String)]()
  def reset(): Unit = produced.clear()

  private[sources] def readLines(dir: String): Array[String] = {
    val p = java.nio.file.Paths.get(dir)
    val files = java.nio.file.Files.list(p).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_)).toSeq.sortBy(_.toString)
    files.flatMap(f =>
      java.nio.file.Files.readAllLines(f, UTF_8).asScala).toArray
  }
}

class MockKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "mock_kafka"
  override def schema(): StructType = MockKafka.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = MockKafka.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MockKafkaStream(
            scanOptions.getOrDefault("subscribe", "topic"),
            scanOptions.get("lines.dir"))
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MockKafkaWriteBuilder(info.schema(),
      info.options().getOrDefault("topic", "topic"))
}

private case class MkOffset(n: Long) extends Offset {
  override def json: String = n.toString
}

/** One static snapshot of `lines.dir` as a replayable offset range —
  * AvailableNow drains it in one micro-batch, exactly like a caught-up
  * Kafka topic. */
class MockKafkaStream(topic: String, linesDir: String) extends MicroBatchStream {
  private lazy val lines: Array[String] = MockKafka.readLines(linesDir)
  override def initialOffset(): Offset = MkOffset(0L)
  override def latestOffset(): Offset = MkOffset(lines.length.toLong)
  override def deserializeOffset(json: String): Offset = MkOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MkOffset].n.toInt
    val e = end.asInstanceOf[MkOffset].n.toInt
    Array(MockKafkaPartition(lines.slice(s, e), topic, s.toLong))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new MockKafkaReader(partition.asInstanceOf[MockKafkaPartition])
    }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class MockKafkaPartition(lines: Array[String], topic: String,
    baseOffset: Long) extends InputPartition

private class MockKafkaReader(p: MockKafkaPartition)
    extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < p.lines.length }
  override def get(): InternalRow = new GenericInternalRow(Array[Any](
    null, // key
    p.lines(i).getBytes(UTF_8), // value
    UTF8String.fromString(p.topic),
    0, // partition
    p.baseOffset + i, // offset
    (p.baseOffset + i) * 1000000L, // timestamp (µs) — deterministic stand-in
    0)) // timestampType = NO_TIMESTAMP/CREATE_TIME slot
  override def close(): Unit = ()
}

// ---------------------------------------------------------------------
// write side (producer sink)
// ---------------------------------------------------------------------

private class MockKafkaWriteBuilder(schema: StructType, topic: String)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MockKafkaBatchWrite(schema, topic)
  }
}

private case class MkCommit(rows: Seq[(Array[Byte], Array[Byte], String)])
  extends WriterCommitMessage

private class MockKafkaBatchWrite(schema: StructType, topic: String)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val keyIdx = schema.fieldNames.indexOf("key")
    val valueIdx = schema.fieldNames.indexOf("value")
    require(valueIdx >= 0, "producer rows need a `value` column (Kafka wire contract)")
    val t = topic
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val buf = Seq.newBuilder[(Array[Byte], Array[Byte], String)]
          override def write(row: InternalRow): Unit = buf += ((
            if (keyIdx >= 0 && !row.isNullAt(keyIdx)) row.getBinary(keyIdx) else null,
            row.getBinary(valueIdx), t))
          override def commit(): WriterCommitMessage = MkCommit(buf.result())
          override def abort(): Unit = () // nothing published before driver commit
          override def close(): Unit = ()
        }
    }
  }
  // two-phase: only the driver-side commit publishes, so a failed/aborted
  // task never leaks rows into the "broker"
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case MkCommit(rows) => rows.foreach(MockKafka.produced.add) }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
