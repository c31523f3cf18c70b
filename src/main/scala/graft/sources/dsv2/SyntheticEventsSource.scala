package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow, Offset => StreamOffset}
import org.apache.spark.sql.sources._
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
  *   - filter pushdown: implements SupportsPushDownFilters — equality /
  *     range / IN predicates are evaluated at row GENERATION, so
  *     non-matching rows never leave the source (the reference pushes its
  *     `match_phrase(rule_name)` into every ES query the same way,
  *     EsParquetWriter.java:69, Bootstrap.java:293)
  *   - limit pushdown: implements SupportsPushDownLimit — each partition
  *     reader stops after `limit` matching rows (the reference's sampling
  *     reads push `.size(1)` server-side, Bootstrap.java:294)
  *   - aggregate pushdown: implements SupportsPushDownAggregates for
  *     `COUNT(*) [GROUP BY <one generated column>]` — the source returns
  *     per-partition partial counts instead of rows, and Spark merges them.
  *     This is exactly the reference's server-side `terms` aggregation
  *     (NewAggregationRequestGenerator at Bootstrap.java:266-283): the
  *     discovery group-count never ships raw documents
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

  /** The generated cell for (column, rowId) — single source of truth shared
    * by the reader and the pushed-filter evaluator. */
  private[dsv2] def cell(column: String, i: Long): Any = column match {
    case "event_id"   => i
    case "ts_us"      => 1704067200000000L + i * 1000000L
    case "user_id"    => i % 97
    case "event_type" => EventTypes((i % 5).toInt)
  }

  /** Evaluate one pushed source filter against the generated row `i`.
    * Only called for filters accepted by `supported`. */
  private[dsv2] def eval(f: Filter, i: Long): Boolean = f match {
    case EqualTo(a, v)            => cell(a, i) == v
    case GreaterThan(a, v)        => compare(cell(a, i), v) > 0
    case GreaterThanOrEqual(a, v) => compare(cell(a, i), v) >= 0
    case LessThan(a, v)           => compare(cell(a, i), v) < 0
    case LessThanOrEqual(a, v)    => compare(cell(a, i), v) <= 0
    case In(a, vs)                => vs.contains(cell(a, i))
    case IsNotNull(_)             => true // nothing generated is null
    case And(l, r)                => eval(l, i) && eval(r, i)
    case Or(l, r)                 => eval(l, i) || eval(r, i)
    case Not(c)                   => !eval(c, i)
    case _                        => true
  }

  private def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Number)   => java.lang.Long.compare(x, y.longValue())
    case (x: String, y: String) => x.compareTo(y)
    case _                      => 0
  }

  /** A filter is pushable when every referenced column is generated and the
    * shape is one this evaluator understands. */
  private[dsv2] def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _)            => hasCol(a)
    case GreaterThan(a, _)        => hasCol(a)
    case GreaterThanOrEqual(a, _) => hasCol(a)
    case LessThan(a, _)           => hasCol(a)
    case LessThanOrEqual(a, _)    => hasCol(a)
    case In(a, _)                 => hasCol(a)
    case IsNotNull(a)             => hasCol(a)
    case And(l, r)                => supported(l) && supported(r)
    case Or(l, r)                 => supported(l) && supported(r)
    case Not(c)                   => supported(c)
    case _                        => false
  }

  private def hasCol(a: String): Boolean = schema.fieldNames.contains(a)
}

private class SyntheticTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "synthetic_events"
  override def schema(): StructType = SyntheticEventsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(
      options.getLong("rows", props.getOrElse("rows", "1000").toLong),
      options.getInt("partitions", props.getOrElse("partitions", "4").toInt),
      options.getLong("rowsPerBatch", props.getOrElse("rowsPerBatch", "100").toLong)
    )
}

private class SyntheticScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType    = SyntheticEventsSource.schema
  private var pushed: Array[Filter]   = Array.empty
  private var limit: Option[Int]      = None
  private var aggGroup: Option[String] = None
  private var aggPushed: Boolean       = false

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(SyntheticEventsSource.supported)
    pushed = accepted
    rejected // evaluated post-scan by Spark
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean =
    if (aggPushed) false else { limit = Some(l); true }

  /** COUNT(*) grouped by at most one generated column — the reference's
    * server-side terms aggregation. Partial pushdown: each partition emits
    * its local counts; Spark's final aggregate merges them (so
    * supportCompletePushDown stays false, the default). */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val groupCols = agg.groupByExpressions.flatMap {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
      case _                                               => None
    }
    val ok = groupCols.length == agg.groupByExpressions.length &&
      groupCols.length <= 1 &&
      groupCols.forall(SyntheticEventsSource.schema.fieldNames.contains) &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) { aggGroup = groupCols.headOption; aggPushed = true }
    ok
  }

  override def build(): Scan =
    if (aggPushed) new SyntheticAggScan(rows, partitions, aggGroup, pushed)
    else new SyntheticScan(rows, partitions, rowsPerBatch, required, pushed, limit)
}

/** Scan for a pushed COUNT(*) [GROUP BY col]: per partition, iterate the
  * generated id range, apply the pushed filters, and emit (group, count)
  * partials — never materializing a single raw row to Spark. */
private class SyntheticAggScan(
    rows: Long,
    partitions: Int,
    group: Option[String],
    pushed: Array[Filter]
) extends Scan
    with Batch {
  override def readSchema(): StructType = {
    val groupFields = group.toSeq.map(c => SyntheticEventsSource.schema(c))
    StructType(groupFields :+ StructField("count(*)", LongType, nullable = false))
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"synthetic_events PushedAggregation: [COUNT(*)${group.fold("")(g => s" GROUP BY $g")}], " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).map { p =>
      val start = p * per
      SyntheticPartition(start, math.min(start + per, rows)): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val g  = group
    val fs = pushed
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[SyntheticPartition]
      new PartitionReader[InternalRow] {
        private var out: Iterator[InternalRow] = _
        private var current: InternalRow       = _
        override def next(): Boolean = {
          if (out == null) {
            val counts = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
            var i = p.start
            while (i < p.end) {
              if (fs.forall(SyntheticEventsSource.eval(_, i))) {
                val key = g.map(SyntheticEventsSource.cell(_, i)).orNull
                counts(key) = counts.getOrElse(key, 0L) + 1L
              }
              i += 1
            }
            out = counts.iterator.map { case (k, n) =>
              val kv = k match {
                case s: String => UTF8String.fromString(s)
                case other     => other
              }
              val values = if (g.isDefined) Seq(kv, n) else Seq(n)
              InternalRow.fromSeq(values)
            }
          }
          val has = out.hasNext
          if (has) current = out.next()
          has
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }
}

private class SyntheticScan(
    rows: Long,
    partitions: Int,
    rowsPerBatch: Long,
    required: StructType,
    pushed: Array[Filter],
    limit: Option[Int]
) extends Scan
    with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SyntheticMicroBatchStream(rows, partitions, rowsPerBatch, required, pushed)
  override def description(): String =
    s"synthetic_events PushedFilters: [${pushed.mkString(", ")}], " +
      s"PushedLimit: ${limit.getOrElse(-1)}, ReadSchema: ${required.catalogString}"
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).map { p =>
      val start = p * per
      SyntheticPartition(start, math.min(start + per, rows)): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required, pushed, limit.getOrElse(Int.MaxValue))
}

private case class SyntheticPartition(start: Long, end: Long) extends InputPartition

/** Streaming offset: the generator cursor — how many rows have been
  * emitted so far. The JSON form is the bare number, so a checkpoint's
  * offset log is human-auditable (`cat offsets/3` shows the cursor). */
private[dsv2] case class RowCursor(pos: Long) extends StreamOffset {
  override def json(): String = pos.toString
}

/** MicroBatchStream over the synthetic generator — the read-side analog of
  * the reference's resumable scroll cursor (EsParquetWriter.java:83-84: a
  * paged scan that always continues from the last returned page token) and
  * the mirror of [[AuditSink]]'s streaming write side.
  *
  *   - Offsets are deterministic row cursors: epoch k reads exactly rows
  *     [k·rowsPerBatch, (k+1)·rowsPerBatch) until the `rows` cap — the
  *     "page size" of the scroll. Admission control caps each batch the
  *     same way a scroll page does; `Trigger.AvailableNow` still drains
  *     everything because Spark keeps asking until latestOffset stops
  *     moving.
  *   - Restart-from-checkpoint: Spark replays the LAST COMMITTED offset
  *     from the checkpoint log and plans the next batch from it — this
  *     stream keeps NO state of its own (a fresh instance resumes from
  *     whatever start offset Spark hands it), which is exactly what makes
  *     the cursor resumable: no row is lost (the cursor only advances on
  *     commit) and none doubled (the epoch's range is [start, end) of the
  *     checkpointed cursor pair; the sink's epoch-replay guard handles the
  *     one at-least-once re-commit after a crash).
  *   - Pushdown caveat: Spark's micro-batch planner does NOT run
  *     V2ScanRelationPushDown, so unlike the batch path the streaming scan
  *     receives the full schema and no pushed filters — Catalyst prunes
  *     and filters ABOVE the scan (pinned in Dsv2SourceSpec so a Spark
  *     upgrade that lifts the limitation surfaces as a test failure).
  */
private class SyntheticMicroBatchStream(
    totalRows: Long,
    partitions: Int,
    rowsPerBatch: Long,
    required: StructType,
    pushed: Array[Filter]
) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: snapshot the end of the "scroll" when the
  // trigger starts, keep paginating in rowsPerBatch epochs up to it, then
  // terminate. The generator's total is already static, so the snapshot
  // is the row cap itself — implementing the interface natively (instead
  // of riding Spark's AvailableNowDataStreamWrapper fallback) keeps the
  // per-epoch admission control in OUR hands and drops the wrapper's
  // runtime warning.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): StreamOffset = RowCursor(0L)

  override def deserializeOffset(json: String): StreamOffset = RowCursor(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val s = start.asInstanceOf[RowCursor].pos
    val step = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _               => rowsPerBatch
    }
    RowCursor(math.min(s + math.max(step, 1L), totalRows))
  }

  // Spark never calls the no-arg variant when SupportsAdmissionControl is
  // implemented; fail loudly rather than silently duplicate logic
  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException("latestOffset(start, limit) is the entry point")

  override def reportLatestOffset(): StreamOffset = RowCursor(totalRows)

  override def planInputPartitions(start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[RowCursor].pos
    val e = end.asInstanceOf[RowCursor].pos
    val n   = math.max(1, partitions)
    val per = (e - s + n - 1) / n
    if (e <= s) Array.empty
    else
      (0 until n)
        .map(p => SyntheticPartition(s + p * per, math.min(s + (p + 1) * per, e)))
        .filter(p => p.end > p.start)
        .map(p => p: InputPartition)
        .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required, pushed, Int.MaxValue)

  // the cursor lives in Spark's checkpoint offset log, not here
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}

private class SyntheticReaderFactory(required: StructType, pushed: Array[Filter], limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var i       = p.start - 1
      private var emitted = 0
      // generation-time filtering: advance past rows the pushed predicates
      // reject, stop once the pushed per-partition limit is satisfied
      override def next(): Boolean = {
        if (emitted >= limit) return false
        i += 1
        while (i < p.end && !pushed.forall(SyntheticEventsSource.eval(_, i))) i += 1
        val has = i < p.end
        if (has) emitted += 1
        has
      }
      override def get(): InternalRow = {
        val values = required.fieldNames.map { c =>
          SyntheticEventsSource.cell(c, i) match {
            case l: Long   => java.lang.Long.valueOf(l)
            case s: String => UTF8String.fromString(s)
            case other     => other
          }
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
