package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 source — the reference's deterministic *producer*
  * (`/root/reference/src/pipeline/builder.rs:73-98`: a closure invoked
  * until it stops yielding) rendered as a first-class Spark connector
  * rather than a driver-side DataFrame: schema inference, SPLITTABLE
  * partitions, column pruning (`SupportsPushDownRequiredColumns`), and
  * id-range predicate pushdown (`SupportsPushDownFilters`) that narrows
  * the generated range BEFORE any row exists.
  *
  * Rows are a pure function of `id` (amount = (id·31 + 7) mod 1000,
  * label = "l" ++ id mod 5) so the source is exactly reproducible on any
  * executor — a DuckDB `generate_series` oracle can replay it.
  *
  * Usage: `spark.read.format("graft.sources.ProducerSource")
  * .option("count", n).option("partitions", p).load()`.
  *
  * Scale: partitions split the (possibly filter-narrowed) range evenly;
  * nothing materializes on the driver. This is the pattern for any
  * external system the cluster must pull in parallel (the reference's
  * unbounded producer maps to the streaming twin in StreamingOps).
  */
class ProducerSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProducerSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ProducerTable(
      Option(properties.get("count")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object ProducerSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("amount", LongType, nullable = false),
    StructField("label", StringType, nullable = false)))

  def amountOf(id: Long): Long = (id * 31L + 7L) % 1000L
  def labelOf(id: Long): String = "l" + (id % 5L)
}

private class ProducerTable(count: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_producer($count)"
  override def schema(): StructType = ProducerSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ProducerScanBuilder(count, partitions)
}

private class ProducerScanBuilder(count: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = count
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = ProducerSource.schema

  /** Accept id-range predicates by narrowing [lo, hi) — the filter is
    * FULLY handled at planning time (rows outside the range are never
    * generated), so it is returned in `pushedFilters` and not kept as a
    * residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThanOrEqual("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft_producer range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
    override def planInputPartitions(): Array[InputPartition] = {
      val n = math.max(1, partitions)
      val span = math.max(0L, hi - lo)
      (0 until n).map { i =>
        ProducerPartition(lo + i * span / n, lo + (i + 1) * span / n)
      }.filter(p => p.to > p.from).toArray[InputPartition]
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new ProducerReaderFactory(required)
  }
}

private case class ProducerPartition(from: Long, to: Long) extends InputPartition

private class ProducerReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ProducerPartition]
    // Resolve the projection ONCE per partition, not per row.
    val cols: Array[Long => Any] = required.fieldNames.map {
      case "id" => (id: Long) => id
      case "amount" => (id: Long) => ProducerSource.amountOf(id)
      case "label" => (id: Long) => UTF8String.fromString(ProducerSource.labelOf(id))
      case other => sys.error(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = part.from - 1
      override def next(): Boolean = { cur += 1; cur < part.to }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map(_(cur)))
      override def close(): Unit = ()
    }
  }
}
