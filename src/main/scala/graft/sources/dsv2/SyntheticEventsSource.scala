package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Minimal DataSource V2 connector (SURVEY.md §2.2 scans/sources row): a
  * deterministic synthetic events generator standing in for the reference's
  * Elasticsearch scroll source (no ES in this environment). What it
  * demonstrates is the real connector machinery the reference's source
  * would use:
  *
  *   - partition planning: `numPartitions` InputPartitions, one reader task
  *     each (the scroll-per-index fan-out, Bootstrap.java:312-316, as
  *     Spark sees it)
  *   - column pruning: implements SupportsPushDownRequiredColumns, so
  *     `SELECT event_type` reads only that column (visible as the pruned
  *     readSchema in the scan node)
  *
  * Usage: spark.read.format("graft.sources.dsv2.SyntheticEventsSource")
  *   .option("rows", 1000).option("partitions", 8).load()
  */
class SyntheticEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]
  ): Table = new SyntheticTable(properties.asScala.toMap)
}

object SyntheticEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false)
  ))
  val EventTypes: Array[String] = Array("click", "view", "purchase", "signup", "error")
}

private class SyntheticTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "synthetic_events"
  override def schema(): StructType = SyntheticEventsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(
      options.getLong("rows", props.getOrElse("rows", "1000").toLong),
      options.getInt("partitions", props.getOrElse("partitions", "4").toInt)
    )
}

private class SyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = SyntheticEventsSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SyntheticScan(rows, partitions, required)
}

private class SyntheticScan(rows: Long, partitions: Int, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).map { p =>
      val start = p * per
      SyntheticPartition(start, math.min(start + per, rows)): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

private case class SyntheticPartition(start: Long, end: Long) extends InputPartition

private class SyntheticReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = {
        // deterministic row derived purely from the id
        val values = required.fieldNames.map {
          case "event_id"   => java.lang.Long.valueOf(i)
          case "ts_us"      => java.lang.Long.valueOf(1704067200000000L + i * 1000000L)
          case "user_id"    => java.lang.Long.valueOf(i % 97)
          case "event_type" =>
            UTF8String.fromString(SyntheticEventsSource.EventTypes((i % 5).toInt))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
