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
  override def schema(): StructType = OrdersSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // INSERT OVERWRITE arrives as truncate+append on a sink with no
      // state to clear — accept and record it.
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftSinkBatchWrite
      }
    }
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

  def reset(): Unit = {
    lastCommitRows.set(-1); lastCommitTasks.set(-1)
    commits.set(0); aborts.set(0)
  }
}
