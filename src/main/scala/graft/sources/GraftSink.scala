package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DSv2 connector seam: `graft.sink` is a
  * writable table whose writers count what they receive and whose
  * COMMIT PROTOCOL carries those counts back to the driver — the
  * two-phase structure (per-task `DataWriter.commit` →
  * `WriterCommitMessage` → job-level `BatchWrite.commit`) every real
  * sink (JDBC, Kafka, object store) implements for exactly-once
  * output. Rows themselves go nowhere (a metrics blackhole), so the
  * spec can assert the PROTOCOL: one job commit, per-partition
  * messages, exact row accounting, and task retries folded in through
  * the message path rather than double-counted side effects.
  */
class GraftSinkTable extends org.apache.spark.sql.connector.catalog.Table
    with SupportsWrite {

  override def name(): String = "graft.sink"
  // The WRITE schema is the 3 data columns only: `bucket` is a READ-side
  // derived partition-key column (SupportsReportPartitioning), not data
  // a writer should have to supply.
  override def schema(): StructType = StructType(OrdersSource.Schema.fields
    .filterNot(_.name == "bucket"))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // INSERT OVERWRITE arrives as truncate+append on a sink with no
      // state to clear — accept and record it.
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftSinkBatchWrite
        override def toStreaming:
            org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new GraftSinkStreamingWrite
      }
    }
}

/** Streaming face of the sink: the same two-phase protocol, keyed by
  * EPOCH. `commit(epochId, …)` publishes idempotently — a replayed
  * epoch (checkpoint-recovery re-running a micro-batch whose commit
  * already landed) is detected and NOT double-counted, which is
  * precisely the exactly-once contract a transactional streaming sink
  * (Kafka transactions, Delta commit log) implements: task retries
  * fold in through the message path, epoch retries through the
  * idempotent publish. */
private class GraftSinkStreamingWrite
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private var n = 0L
          override def write(record: InternalRow): Unit = n += 1
          override def commit(): WriterCommitMessage = GraftSinkCommit(n)
          override def abort(): Unit = ()
          override def close(): Unit = ()
        }
    }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val counts = messages.collect { case m: GraftSinkCommit => m }
    GraftSinkRegistry.recordEpoch(epochId, counts.map(_.rows).sum, counts.length)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftSinkRegistry.aborts.incrementAndGet()
}

private class GraftSinkBatchWrite extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val counts = messages.collect { case m: GraftSinkCommit => m }
    GraftSinkRegistry.record(counts.map(_.rows).sum, counts.length)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftSinkRegistry.aborts.incrementAndGet()
}

private class GraftSinkWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = GraftSinkCommit(n)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private case class GraftSinkCommit(rows: Long) extends WriterCommitMessage

/** Driver-side accounting the job-level commit writes into — what a
  * real sink's commit() would atomically publish (a manifest, an
  * offset vector, a transaction). */
object GraftSinkRegistry {
  val lastCommitRows = new java.util.concurrent.atomic.AtomicLong(-1)
  val lastCommitTasks = new java.util.concurrent.atomic.AtomicLong(-1)
  val commits = new java.util.concurrent.atomic.AtomicLong(0)
  val aborts = new java.util.concurrent.atomic.AtomicLong(0)

  def record(rows: Long, tasks: Int): Unit = {
    lastCommitRows.set(rows)
    lastCommitTasks.set(tasks)
    commits.incrementAndGet()
  }

  /** Per-epoch streaming ledger: epochId → (rows, tasks). */
  val epochCommits =
    new java.util.concurrent.ConcurrentHashMap[Long, (Long, Int)]()
  val replayedEpochs = new java.util.concurrent.atomic.AtomicLong(0)

  /** Idempotent epoch publish — the exactly-once seam: a re-delivered
    * epoch leaves the ledger untouched and only bumps the replay
    * counter. */
  def recordEpoch(epochId: Long, rows: Long, tasks: Int): Unit =
    if (epochCommits.putIfAbsent(epochId, (rows, tasks)) != null)
      replayedEpochs.incrementAndGet()

  def reset(): Unit = {
    lastCommitRows.set(-1); lastCommitTasks.set(-1)
    commits.set(0); aborts.set(0)
    epochCommits.clear(); replayedEpochs.set(0)
  }
}
