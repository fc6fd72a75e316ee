package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-collector` — the WRITE side of the DataSource V2 surface: a
  * sink that aggregates per-task row counts and an order-insensitive
  * checksum through the connector's two-phase commit protocol.
  *
  * What it demonstrates:
  *   - `SupportsWrite` / `WriteBuilder` / `BatchWrite` / `DataWriter`:
  *     each task writes independently and emits a `WriterCommitMessage`;
  *     ONLY messages of committed tasks reach `BatchWrite.commit`, so a
  *     speculative or failed task's partial output is never observed —
  *     the exactly-once contract a real sink (file commit protocol,
  *     transactional DB) builds on;
  *   - `supportsExternalMetadata`: the sink accepts whatever schema the
  *     writer brings (no inference).
  *
  * Results land in [[CollectorSink.results]] keyed by the `name` option —
  * which makes it a handy assertion sink for specs, and a zero-overhead
  * "blackhole with checksums" for throughput measurement (the analogue of
  * a console/noop sink, but verifiable).
  *
  * Scale: per-task state is two longs; commit aggregates T messages on
  * the driver — nothing buffers rows.
  */
object CollectorSink {
  /** name option → (rows, xor-checksum of first-column hashes). */
  val results: TrieMap[String, (Long, Long)] = TrieMap.empty

  /** name option → last committed streaming epochId, the idempotence
    * ledger: a failure-recovery replay re-delivers an epoch the sink
    * already folded in, and without this check it would double-count
    * (worse, the xor checksum would silently CANCEL the duplicate rows).
    * A real transactional sink persists this next to the data; process
    * memory is the right scope for an in-memory sink. */
  val lastEpoch: TrieMap[String, Long] = TrieMap.empty
}

case class CollectorCommit(rows: Long, checksum: Long) extends WriterCommitMessage

class CollectorSinkProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the writer
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CollectorTable(
      Option(properties.get("name")).getOrElse("default"), schema)
}

class CollectorTable(sinkName: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_collector($sinkName)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
                    TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // overwrite == reset
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
            new CollectorWriterFactory(writeSchema.fields.headOption.map(_.dataType))
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val rows = messages.map(_.asInstanceOf[CollectorCommit].rows).sum
            val sum = messages.map(_.asInstanceOf[CollectorCommit].checksum)
              .foldLeft(0L)(_ ^ _)
            CollectorSink.results.put(sinkName, (rows, sum))
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }

        // streaming: one commit per epoch; totals ACCUMULATE across epochs,
        // and the epochId ledger makes the accumulation idempotent — a
        // re-delivered epoch (failure-recovery replay of an unacknowledged
        // batch) is skipped instead of double-counted
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(pi: PhysicalWriteInfo): StreamingDataWriterFactory =
            new CollectorStreamingWriterFactory(writeSchema.fields.headOption.map(_.dataType))
          override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
            CollectorSink.results.synchronized {
              if (CollectorSink.lastEpoch.get(sinkName).forall(epochId > _)) {
                val rows = messages.map(_.asInstanceOf[CollectorCommit].rows).sum
                val sum = messages.map(_.asInstanceOf[CollectorCommit].checksum)
                  .foldLeft(0L)(_ ^ _)
                val (r0, s0) = CollectorSink.results.getOrElse(sinkName, (0L, 0L))
                CollectorSink.results.put(sinkName, (r0 + rows, s0 ^ sum))
                CollectorSink.lastEpoch.put(sinkName, epochId)
              }
            }
          override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

class CollectorStreamingWriterFactory(firstColType: Option[org.apache.spark.sql.types.DataType])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new CollectorWriterFactory(firstColType).createWriter(partitionId, taskId)
}

class CollectorWriterFactory(firstColType: Option[org.apache.spark.sql.types.DataType])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        // first-column hash; xor-fold → order- and partitioning-insensitive
        firstColType.foreach { dt =>
          if (!record.isNullAt(0))
            sum ^= scala.util.hashing.MurmurHash3
              .stringHash(String.valueOf(record.get(0, dt))).toLong
        }
      }
      override def commit(): WriterCommitMessage = CollectorCommit(rows, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
