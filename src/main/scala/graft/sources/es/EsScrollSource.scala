package graft.sources.es

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.sources.SchemaInfer
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** A REAL Elasticsearch scroll-scan connector — the reference's actual data
  * source (EsParquetWriter.java:64-84: initial `_search` with a bool/
  * match_phrase query, `size(10000)`, `scroll=3m`, then the
  * `_search/scroll` loop until an empty hit page), re-expressed as a Spark
  * DataSource V2 batch source that speaks the ES REST wire protocol over
  * HTTP. Unlike the synthetic DSv2 analog (SyntheticEventsSource, which
  * proves the connector MACHINERY against generated rows), this connector
  * issues real HTTP requests and parses real ES JSON responses — point it
  * at any ES-compatible endpoint. In this sandbox it is exercised against
  * [[EsStubServer]], an in-JVM HTTP server speaking the same wire format
  * (the standard integration-test double; no live cluster exists here).
  *
  * Scale design (the part the reference's single-threaded scroll lacks):
  *   - **Sliced scroll fan-out**: `slices=N` plans N InputPartitions, each
  *     driving an independent server-side slice (`"slice":{"id":i,"max":N}`)
  *     — ES partitions the index server-side and N executor tasks pull
  *     disjoint row sets concurrently. This is the documented ES mechanism
  *     for parallel full-index export, and it is exactly Spark's partition
  *     model: on a 1000-executor cluster the scan parallelizes without any
  *     driver coordination beyond partition planning.
  *   - **Filter pushdown to the ES query DSL**: accepted Spark source
  *     filters compile to `bool`/`match_phrase`/`term`/`terms`/`range`/
  *     `exists` clauses in the search body (the reference pushes its
  *     `match_phrase(rule_name)` the same way), so non-matching documents
  *     never leave the server. Pushed state is visible in the scan
  *     description (`.explain` shows `PushedEsQuery`).
  *   - **Column pruning over the wire**: the pruned read schema becomes the
  *     request's `"_source": [cols...]` filter, so unneeded fields are not
  *     serialized, shipped, or parsed.
  *   - **Limit pushdown**: a pushed limit caps `size` per page and stops
  *     each slice's scroll loop after `limit` rows (the reference's
  *     sampling reads push `.size(1)` server-side the same way; Spark
  *     still applies the exact global limit post-scan).
  *   - **Tolerant decode**: missing fields → null, type mismatches → null
  *     (the reference's ExtendedJsonDecoder default-injection philosophy);
  *     a hit whose `_source` is not an object is skipped and counted, the
  *     reference's per-record try/catch-skip (EsParquetWriter.java:73-81).
  *   - **Scroll hygiene**: every reader clears its scroll context
  *     (`DELETE /_search/scroll`) on close — long-running exports don't pin
  *     server search contexts.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.es.EsScrollSource")
  *     .schema(eventsSchema)                   // or omit → sampled inference
  *     .option("url", "http://host:9200")
  *     .option("index", "events")
  *     .option("slices", 8)
  *     .option("pageSize", 2000)
  *     .load()
  *     .where($"event_type" === "purchase")    // pushed as match_phrase
  * }}}
  */
class EsScrollSource extends TableProvider {

  /** A user-supplied schema is the normal path (the reference persists its
    * inferred schema and reuses it, O9); inference below is the fallback. */
  override def supportsExternalMetadata(): Boolean = true

  /** Schema inference when the user supplies none: sample one page
    * (`size=inferSample`, match_all) and run the engine's own JSON schema
    * inference (SchemaInfer, the O6/O7 pipeline) over the raw `_source`
    * strings — the reference infers its Avro schema from sampled docs the
    * same way (Bootstrap.java:294-303). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val url    = EsScrollSource.reqOption(options, "url")
    val index  = EsScrollSource.reqOption(options, "index")
    val sample = options.getInt("inferSample", 100)
    val body   = s"""{"size":$sample,"query":{"match_all":{}}}"""
    val resp   = EsScrollSource.post(s"$url/$index/_search", body)
    val m      = new ObjectMapper
    val hits   = m.readTree(resp).path("hits").path("hits")
    val sources = (0 until hits.size).map(i => hits.get(i).path("_source").toString)
    val spark   = SparkSession.active
    import spark.implicits._
    SchemaInfer.allNullable(SchemaInfer.infer(spark, spark.createDataset(sources)))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]
  ): Table = new EsScrollTable(schema, properties.asScala.toMap)
}

object EsScrollSource {
  private[es] def reqOption(o: CaseInsensitiveStringMap, k: String): String = {
    val v = o.get(k)
    require(v != null, s"es-scroll source requires option '$k'")
    v
  }

  private val client = HttpClient.newHttpClient()

  private[es] def post(url: String, body: String): String =
    send(HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)))

  private[es] def delete(url: String, body: String): String =
    send(HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .method("DELETE", HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)))

  private def send(b: HttpRequest.Builder): String = {
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"ES request failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
    resp.body()
  }

  /** Compile accepted Spark source filters to an ES query-DSL JSON string.
    * Strings equality-match via `match_phrase` (the reference's operator for
    * its rule_name predicate); other equalities use `term`; ranges use
    * `range` with ISO-instant rendering for timestamps. Unsupported shapes
    * are rejected in [[supported]] and left for Spark to evaluate. */
  private[es] def toEsQuery(filters: Array[Filter]): String = {
    val m = new ObjectMapper
    def clause(f: Filter): ObjectNode = {
      val n = m.createObjectNode()
      f match {
        case EqualTo(a, v: String) => n.putObject("match_phrase").put(a, v)
        case EqualTo(a, v)         => putVal(n.putObject("term"), a, v)
        case In(a, vs) =>
          val arr = n.putObject("terms").putArray(a)
          vs.foreach(v => putArr(arr, v))
        case GreaterThan(a, v)        => putVal(n.putObject("range").putObject(a), "gt", v)
        case GreaterThanOrEqual(a, v) => putVal(n.putObject("range").putObject(a), "gte", v)
        case LessThan(a, v)           => putVal(n.putObject("range").putObject(a), "lt", v)
        case LessThanOrEqual(a, v)    => putVal(n.putObject("range").putObject(a), "lte", v)
        case IsNotNull(a)             => n.putObject("exists").put("field", a)
        case And(l, r) =>
          val must = n.putObject("bool").putArray("must")
          must.add(clause(l)); must.add(clause(r))
        case Or(l, r) =>
          val b = n.putObject("bool")
          val should = b.putArray("should")
          should.add(clause(l)); should.add(clause(r))
          b.put("minimum_should_match", 1)
        case Not(c) =>
          n.putObject("bool").putArray("must_not").add(clause(c))
        case other => throw new IllegalArgumentException(s"unpushable filter $other")
      }
      n
    }
    if (filters.isEmpty) """{"match_all":{}}"""
    else if (filters.length == 1) clause(filters.head).toString
    else {
      val root = m.createObjectNode()
      val must = root.putObject("bool").putArray("must")
      filters.foreach(f => must.add(clause(f)))
      root.toString
    }
  }

  private def putVal(n: ObjectNode, k: String, v: Any): Unit = v match {
    case s: String             => n.put(k, s)
    case i: Int                => n.put(k, i)
    case l: Long               => n.put(k, l)
    case d: Double             => n.put(k, d)
    case f: Float              => n.put(k, f.toDouble)
    case b: Boolean            => n.put(k, b)
    case t: java.sql.Timestamp => n.put(k, t.toInstant.toString)
    case i: Instant            => n.put(k, i.toString)
    case d: java.sql.Date      => n.put(k, d.toString)
    case other                 => n.put(k, String.valueOf(other))
  }

  private def putArr(a: ArrayNode, v: Any): Unit = v match {
    case s: String             => a.add(s)
    case i: Int                => a.add(i)
    case l: Long               => a.add(l)
    case d: Double             => a.add(d)
    case b: Boolean            => a.add(b)
    case t: java.sql.Timestamp => a.add(t.toInstant.toString)
    case other                 => a.add(String.valueOf(other))
  }

  private[es] def supported(f: Filter): Boolean = f match {
    case EqualTo(_, null)                       => false
    case EqualTo(_, _) | In(_, _) | IsNotNull(_) => true
    case GreaterThan(_, _) | GreaterThanOrEqual(_, _) => true
    case LessThan(_, _) | LessThanOrEqual(_, _)       => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r)  => supported(l) && supported(r)
    case Not(c)    => supported(c)
    case _         => false
  }

  /** One `_source` JSON field → the Spark internal value for `dt`; null on
    * absence or shape mismatch (tolerant decode). */
  private[es] def toInternal(node: JsonNode, dt: DataType): Any = {
    if (node == null || node.isNull || node.isMissingNode) return null
    dt match {
      case LongType if node.canConvertToLong   => node.asLong()
      case IntegerType if node.canConvertToInt => node.asInt()
      case DoubleType if node.isNumber         => node.asDouble()
      case FloatType if node.isNumber          => node.asDouble().toFloat
      case BooleanType if node.isBoolean       => node.asBoolean()
      case StringType =>
        UTF8String.fromString(if (node.isTextual) node.asText() else node.toString)
      case TimestampType =>
        try {
          if (node.isNumber) node.asLong() * 1000L // epoch_millis convention
          else {
            val i = Instant.parse(node.asText())
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          }
        } catch { case _: Exception => null }
      case DateType if node.isTextual =>
        try java.time.LocalDate.parse(node.asText()).toEpochDay.toInt
        catch { case _: Exception => null }
      case _ => null
    }
  }
}

private class EsScrollTable(schema0: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"es-scroll(${props.getOrElse("index", "?")})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EsScanBuilder(
      schema0,
      EsScrollSource.reqOption(options, "url"),
      EsScrollSource.reqOption(options, "index"),
      options.getInt("slices", 4),
      options.getInt("pageSize", 1000),
      options.get("scroll", "3m") // the reference's TimeValue.timeValueMinutes(3)
    )
}

private class EsScanBuilder(
    full: StructType,
    url: String,
    index: String,
    slices: Int,
    pageSize: Int,
    scroll: String
) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit {
  private var required: StructType  = full
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int]    = None

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(f =>
      EsScrollSource.supported(f) && refsKnownCols(f))
    pushed = ok
    rest
  }
  private def refsKnownCols(f: Filter): Boolean =
    f.references.forall(full.fieldNames.contains)
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  override def build(): Scan =
    new EsScrollScan(url, index, slices, pageSize, scroll, required,
      EsScrollSource.toEsQuery(pushed), pushed, limit)
}

private case class EsSlicePartition(
    sliceId: Int,
    sliceMax: Int,
    url: String,
    index: String,
    queryJson: String,
    pageSize: Int,
    scroll: String,
    schemaJson: String,
    limit: Int // -1 = unlimited
) extends InputPartition

private class EsScrollScan(
    url: String,
    index: String,
    slices: Int,
    pageSize: Int,
    scroll: String,
    required: StructType,
    queryJson: String,
    pushed: Array[Filter],
    limit: Option[Int]
) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"es-scroll index=$index slices=$slices PushedEsQuery: $queryJson, " +
      s"PushedFilters: [${pushed.mkString(", ")}]${limit.fold("")(l => s", PushedLimit: $l")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    (0 until n).map { i =>
      EsSlicePartition(i, n, url, index, queryJson,
        limit.fold(pageSize)(l => math.min(pageSize, math.max(1, l))),
        scroll, required.json, limit.getOrElse(-1)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new EsScrollReader(p.asInstanceOf[EsSlicePartition])
    }
}

/** One slice's scroll loop — the reference's EsParquetWriter.call() body
  * (initial search → page loop via scroll_id → close), plus slice fan-out
  * and clear-scroll hygiene the reference lacks. */
private class EsScrollReader(p: EsSlicePartition) extends PartitionReader[InternalRow] {
  private val mapper  = new ObjectMapper
  private val schema  = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
  private val fields  = schema.fields
  private var scrollId: String = _
  private var page: JsonNode   = _ // current hits array
  private var pos              = 0
  private var emitted          = 0L
  private var row: InternalRow = _
  /** Hits whose _source is not an object — skipped, reference's
    * per-record catch (EsParquetWriter.java:78-81). */
  private var skipped = 0L

  private def searchBody(): String = {
    val root = mapper.createObjectNode()
    if (p.sliceMax > 1) {
      val s = root.putObject("slice")
      s.put("id", p.sliceId); s.put("max", p.sliceMax)
    }
    root.put("size", p.pageSize)
    root.set[ObjectNode]("query", mapper.readTree(p.queryJson).asInstanceOf[ObjectNode])
    val src = root.putArray("_source")
    fields.foreach(f => src.add(f.name))
    root.putArray("sort").add("_doc")
    root.toString
  }

  private def firstPage(): Unit = {
    val resp = mapper.readTree(
      EsScrollSource.post(s"${p.url}/${p.index}/_search?scroll=${p.scroll}", searchBody()))
    scrollId = resp.path("_scroll_id").asText()
    page = resp.path("hits").path("hits")
    pos = 0
  }

  private def nextPage(): Unit = {
    val body = s"""{"scroll":"${p.scroll}","scroll_id":${mapper.writeValueAsString(scrollId)}}"""
    val resp = mapper.readTree(EsScrollSource.post(s"${p.url}/_search/scroll", body))
    scrollId = resp.path("_scroll_id").asText(scrollId)
    page = resp.path("hits").path("hits")
    pos = 0
  }

  override def next(): Boolean = {
    if (p.limit >= 0 && emitted >= p.limit) return false
    while (true) {
      if (page == null) firstPage()
      else if (pos >= page.size()) {
        if (page.size() == 0) return false // empty page ends the scroll (reference loop condition)
        nextPage()
        if (page.size() == 0) return false
      }
      while (pos < page.size()) {
        val src = page.get(pos).path("_source")
        pos += 1
        if (src.isObject) {
          val vals = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            vals(i) = EsScrollSource.toInternal(src.get(fields(i).name), fields(i).dataType)
            i += 1
          }
          row = new GenericInternalRow(vals)
          emitted += 1
          return true
        } else skipped += 1
      }
    }
    false
  }

  override def get(): InternalRow = row

  override def close(): Unit =
    if (scrollId != null) {
      try EsScrollSource.delete(s"${p.url}/_search/scroll",
        s"""{"scroll_id":[${mapper.writeValueAsString(scrollId)}]}""")
      catch { case _: Exception => () } // best-effort, contexts also expire by keep-alive
    }
}
