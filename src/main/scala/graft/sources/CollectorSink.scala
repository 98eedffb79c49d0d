package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSourceV2 WRITE connector — the reference's *consumer* end
  * (`/root/reference/src/pipeline/builder.rs:331-360`: a closure invoked
  * per item, no output pipe) rendered through Spark's two-phase commit
  * protocol rather than a driver-side foreach:
  *
  *  - each task gets a [[DataWriter]] buffering only COUNTS and a
  *    commutative content checksum (never the rows);
  *  - a task that fails calls `abort()` and its partial state vanishes;
  *  - only writers that reach task-commit produce a
  *    [[WriterCommitMessage]], and Spark's output-commit coordinator
  *    guarantees ONE committed attempt per partition even under retry /
  *    speculation;
  *  - the driver's `BatchWrite.commit` publishes the aggregate into the
  *    named registry ATOMICALLY — a failed job leaves no entry at all
  *    (no partial visibility), which is the exactly-once contract a real
  *    sink (parquet commit protocol, transactional warehouse write)
  *    provides at cluster scale.
  *
  * The checksum is a SUM of per-row signed hashes, so it is independent
  * of partitioning and row order — the same reason the dedup family uses
  * commutative aggregates: any repartitioning of the same bag commits
  * the same value.
  *
  * Usage: `df.write.format("graft.sources.CollectorSink")
  * .option("name", "run1").mode("append").save()`, then
  * `CollectorSink.result("run1")`.
  */
class CollectorSink extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  /** Write-only source: the schema always comes from the query. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CollectorTable(schema,
      Option(properties.get("name")).getOrElse("default"),
      Option(properties.get("failrow")).map(_.toLong),
      // failoncerow: fail the matching row on task ATTEMPT 0 only — the
      // retry-level exactly-once fixture (needs task retries enabled,
      // i.e. master local[N,F>1]; see RetryExactlyOnceSpec).
      Option(properties.get("failoncerow")).map(_.toLong))
}

object CollectorSink {

  /** One committed write: row count, committed task count, order- and
    * partitioning-independent content checksum.
    */
  final case class Result(rows: Long, tasks: Int, checksum: Long)

  private val registry = TrieMap.empty[String, Result]

  def result(name: String): Option[Result] = registry.get(name)
  def publish(name: String, r: Result): Unit = registry.put(name, r)
  def clear(name: String): Unit = registry.remove(name)

  /** Content-based per-row hasher: Catalyst's `XxHash64` over bound
    * references to every column. Unlike a toString render (which is
    * identity-based, not content-based, for UnsafeArrayData / UnsafeRow /
    * MapData), XxHash64 recurses into arrays, structs and maps by VALUE,
    * so the advertised order/partitioning-independent checksum holds for
    * nested schemas too. Deterministic across JVMs (fixed seed, fixed
    * algorithm) -- the same engine-run determinism the old JLS
    * String.hashCode render gave, without the nested-type hole.
    */
  def rowHasher(schema: StructType): InternalRow => Long = {
    val refs = schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        i, f.dataType, f.nullable)
    }
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(refs, 42L)
    row => h.eval(row).asInstanceOf[Long]
  }
}

private class CollectorTable(schema0: StructType, name0: String,
    failRow: Option[Long], failOnceRow: Option[Long])
    extends Table with SupportsWrite {
  override def name(): String = s"graft_collector($name0)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CollectorBatchWrite(info.schema(), name0, failRow, failOnceRow)
      }
    }
}

private class CollectorBatchWrite(schema: StructType, name: String,
    failRow: Option[Long], failOnceRow: Option[Long]) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new CollectorWriterFactory(schema, failRow, failOnceRow)

  /** Atomic publish — runs once, only if EVERY task committed. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: CollectorCommit => m }
    CollectorSink.publish(name,
      CollectorSink.Result(ms.map(_.rows).sum, ms.length, ms.map(_.checksum).sum))
  }

  /** A failed job publishes NOTHING — no partial visibility. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private final case class CollectorCommit(partitionId: Int, rows: Long,
    checksum: Long) extends WriterCommitMessage

private class CollectorWriterFactory(schema: StructType,
    failRow: Option[Long], failOnceRow: Option[Long])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var checksum = 0L
      private val hash = CollectorSink.rowHasher(schema)
      private def keyMatches(row: InternalRow, k: Long): Boolean =
        schema.nonEmpty &&
          schema.head.dataType == org.apache.spark.sql.types.LongType &&
          row.getLong(0) == k
      override def write(row: InternalRow): Unit = {
        // Deterministic fault injection for the abort-path spec: dying
        // MID-TASK proves partial task state never becomes visible.
        if (failRow.isDefined && keyMatches(row, failRow.get))
          throw new RuntimeException(s"injected failure at row ${failRow.get}")
        // Retry fixture: same death, but only on the FIRST attempt — the
        // re-attempt sails through, and exactly one attempt's counts may
        // reach the driver commit.
        if (failOnceRow.isDefined && keyMatches(row, failOnceRow.get) &&
            org.apache.spark.TaskContext.get() != null &&
            org.apache.spark.TaskContext.get().attemptNumber() == 0)
          throw new RuntimeException(
            s"injected first-attempt failure at row ${failOnceRow.get}")
        rows += 1
        checksum += hash(row)
      }
      override def commit(): WriterCommitMessage = {
        val id = org.apache.spark.TaskContext.get() match {
          case null => 0
          case tc   => tc.partitionId()
        }
        CollectorCommit(id, rows, checksum)
      }
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
