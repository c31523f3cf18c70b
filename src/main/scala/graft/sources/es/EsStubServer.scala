package graft.sources.es

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** An in-JVM HTTP server speaking the Elasticsearch search/scroll wire
  * format — the integration-test double for the live cluster the reference
  * connects to (ElasticsearchConnection.connect, Bootstrap.java:262-263).
  * [[EsScrollSource]] is a REAL wire-protocol connector; this server is the
  * only stand-in, and only because no ES cluster exists in this sandbox.
  *
  * Implements the slice of the ES REST API a scroll export touches:
  *   - `POST /{index}/_search?scroll=...` — initial search: evaluates the
  *     request's query DSL (`match_all` / `match_phrase` / `term` /
  *     `terms` / `range` / `exists` / `bool` with must/should/must_not)
  *     against the seeded rows, applies the `slice` spec (docs are
  *     distributed by row index mod `max` — the server-side detail a
  *     client never observes), honors `"_source": [cols...]` filtering,
  *     returns the first `size` hits plus a `_scroll_id`.
  *   - `POST /_search/scroll` — next page for a live scroll context; an
  *     exhausted context returns an empty hit page (the loop-termination
  *     condition the reference polls, EsParquetWriter.java:72).
  *   - `DELETE /_search/scroll` — clears contexts (counted, so tests can
  *     assert the connector's scroll hygiene).
  *
  * Rows are seeded from a DataFrame via [[EsStubServer.fromDataFrame]] —
  * the one driver-side collect is the test double's seed (the server plays
  * the EXTERNAL system holding the data; it is not an engine data path)
  * and is bounded by fixture scale. Timestamps are served as ISO-8601
  * instants (the ES `date` convention); `malformedEvery=n` replaces every
  * n-th hit's `_source` with a scalar to exercise the connector's
  * per-record skip.
  */
class EsStubServer(
    index: String,
    colNames: Array[String],
    rows: IndexedSeq[Array[Any]],
    malformedEvery: Int = 0,
    rejectEvery: Int = 0,
    extraIndices: Map[String, IndexedSeq[Array[Any]]] = Map.empty,
    requireAuth: String = null, // expected Authorization header; null = open cluster
    analyzedPhrase: Boolean = false // real-ES text semantics: match_phrase = consecutive-token containment
) {
  private val allIndices: Map[String, IndexedSeq[Array[Any]]] =
    extraIndices + (index -> rows)
  private val mapper = new ObjectMapper
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  // observability for specs: what the connector actually sent
  @volatile var lastSearchBody: String = ""
  /** `scroll=` keep-alive of the last initial search (was once silently
    * "null" via an auto-tupled options.get — keep it asserted). */
  @volatile var lastScrollKeepAlive: String = ""
  val searchCalls  = new AtomicLong(0)
  val scrollCalls  = new AtomicLong(0)
  val clearedScrolls = new AtomicLong(0)
  /** Total hits serialized over the wire (pushdown tests assert this). */
  val hitsServed = new AtomicLong(0)
  /** Requests shed with 429 (`rejectEvery` fault injection). */
  val rejected = new AtomicLong(0)
  /** `size:0` aggregation searches served (discovery-pushdown assertions). */
  val aggCalls = new AtomicLong(0)
  private val reqSeq = new AtomicLong(0)
  /** Per-index `_search` hit counts — index-pruning tests assert that a
    * pruned index never receives a request. */
  private val searchesPerIndex = new ConcurrentHashMap[String, AtomicLong]()
  def searchCount(idx: String): Long = {
    val c = searchesPerIndex.get(idx); if (c == null) 0L else c.get()
  }

  private case class Ctx(data: IndexedSeq[Array[Any]], ids: Array[Int], cols: Array[String], pageSize: Int, var pos: Int)
  private val contexts = new ConcurrentHashMap[String, Ctx]()
  /** Open point-in-time snapshots (id -> the frozen rows). */
  private val pits = new ConcurrentHashMap[String, IndexedSeq[Array[Any]]]()
  val clearedPits = new AtomicLong(0)

  def liveContexts: Int = contexts.size()
  def livePits: Int = pits.size()

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    server.setExecutor(pool)
    server.start()
    server.getAddress.getPort
  }

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** HttpServer.stop does NOT shut down a user-supplied executor; without the
    * explicit shutdown the 8 non-daemon pool threads keep the JVM alive after
    * main() returns (a Verify run would never exit). */
  def stop(): Unit = if (server != null) {
    server.stop(0)
    pool.shutdownNow()
  }

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val q = ex.getRequestURI.getQuery
    if (q != null && q.startsWith("scroll=")) lastScrollKeepAlive = q.stripPrefix("scroll=")
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    // Authentication FIRST (real ES's security filter runs before the
    // search layer): a secured stub 401s any request without the exact
    // expected Authorization header — non-retryable, the client fails fast.
    if (requireAuth != null && ex.getRequestHeaders.getFirst("Authorization") != requireAuth) {
      val err = """{"error":{"type":"security_exception","reason":"missing authentication credentials"}}"""
        .getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(401, err.length)
      ex.getResponseBody.write(err)
      ex.close()
      return
    }
    // Load shedding BEFORE any state mutation — exactly where real ES
    // rejects (es_rejected_execution), so a client retry is always safe.
    if (rejectEvery > 0 && reqSeq.incrementAndGet() % rejectEvery == 0) {
      rejected.incrementAndGet()
      val err = """{"error":{"type":"es_rejected_execution_exception"}}""".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(429, err.length)
      ex.getResponseBody.write(err)
      ex.close()
      return
    }
    try {
      val resp: String = (ex.getRequestMethod, path) match {
        case ("DELETE", "/_search/scroll") => clearScroll(body)
        case ("POST" | "GET", "/_search/scroll") => scrollNext(body)
        case ("GET", "/_cat/indices") => catIndices()
        case ("GET", p) if p.endsWith("/_mapping") =>
          mappingOf(p.stripPrefix("/").stripSuffix("/_mapping"))
        case ("DELETE", "/_pit") => clearPit(body)
        case ("POST", p) if p.endsWith("/_pit") && knownIndices(p.stripSuffix("/_pit") + "/_search") =>
          openPit(p)
        case ("POST" | "GET", "/_search") => pitSearch(body)
        case ("POST" | "GET", p) if p.endsWith("/_search") && knownIndices(p) =>
          initialSearch(body, searchTarget(p))
        case _ => throw new IllegalArgumentException(s"unhandled route ${ex.getRequestMethod} $path")
      }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
    } catch {
      case e: Exception =>
        val err = s"""{"error":${mapper.writeValueAsString(e.toString)}}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(400, err.length)
        ex.getResponseBody.write(err)
    } finally ex.close()
  }

  private def pathIndices(path: String): Seq[String] =
    path.stripPrefix("/").stripSuffix("/_search").split(',').toSeq

  private def knownIndices(path: String): Boolean =
    pathIndices(path).forall(allIndices.contains)

  /** Resolve a `/{idx1,idx2,...}/_search` path to the concatenated rows of
    * the named indices (the ES multi-index search). Counts each component
    * ONCE per request for the pruning assertions. */
  private def searchTarget(path: String): IndexedSeq[Array[Any]] = {
    val names = pathIndices(path)
    names.foreach(n => searchesPerIndex.computeIfAbsent(n, _ => new AtomicLong(0)).incrementAndGet())
    names.flatMap(allIndices(_)).toIndexedSeq
  }

  // ---- point-in-time + search_after (the modern pagination the connector's
  // "search_after" mode drives; scroll stays for reference parity) --------

  private def openPit(path: String): String = {
    val id = s"pit:${UUID.randomUUID().toString}"
    pits.put(id, searchTarget(path.stripSuffix("/_pit") + "/_search"))
    s"""{"id":${mapper.writeValueAsString(id)}}"""
  }

  private def clearPit(body: String): String = {
    val id = mapper.readTree(body).path("id").asText()
    val n  = if (pits.remove(id) != null) 1 else 0
    clearedPits.addAndGet(n)
    s"""{"succeeded":true,"num_freed":$n}"""
  }

  /** `POST /_search` against an open PIT: sort is the row index (the
    * stub's `_shard_doc` analog), `search_after:[i]` resumes strictly past
    * it; each hit echoes its `sort` for the client to chain. */
  private def pitSearch(body: String): String = {
    searchCalls.incrementAndGet()
    lastSearchBody = body
    val req  = mapper.readTree(body)
    val id   = req.path("pit").path("id").asText()
    val data = pits.get(id)
    require(data != null, s"unknown pit id $id") // ES: search_context_missing
    val size  = req.path("size").asInt(10)
    val slice = req.path("slice")
    val (sliceId, sliceMax) =
      if (slice.isObject) (slice.get("id").asInt(), slice.get("max").asInt()) else (0, 1)
    val cols: Array[String] =
      if (req.path("_source").isArray) {
        val a = req.get("_source").asInstanceOf[ArrayNode]
        (0 until a.size).map(a.get(_).asText()).toArray
      } else colNames
    val q     = req.path("query")
    val after = req.path("search_after")
    val from  = if (after.isArray && after.size() > 0) after.get(0).asInt() + 1 else 0
    val root    = mapper.createObjectNode()
    root.put("pit_id", id)
    val hitsObj = root.putObject("hits")
    val arr     = hitsObj.putArray("hits")
    var i = from
    var n = 0
    while (i < data.length && n < size) {
      if (i % sliceMax == sliceId && evalQuery(q, data(i))) {
        val hit = arr.addObject()
        hit.put("_index", index)
        hit.put("_id", i.toString)
        if (malformedEvery > 0 && (i + 1) % malformedEvery == 0)
          hit.put("_source", 42)
        else {
          val src = hit.putObject("_source")
          cols.foreach { c =>
            val ci = colNames.indexOf(c)
            if (ci >= 0) putJson(src, c, data(i)(ci))
          }
        }
        hit.putArray("sort").add(i)
        hitsServed.incrementAndGet()
        n += 1
      }
      i += 1
    }
    hitsObj.putObject("total").put("value", n).put("relation", "gte")
    root.toString
  }

  private def catIndices(): String = {
    val arr = mapper.createArrayNode()
    allIndices.keys.toSeq.sorted.foreach(n => arr.addObject().put("index", n))
    arr.toString
  }

  /** `GET /<index-or-pattern>/_mapping` — field mappings inferred from the
    * seeded rows, in the real response shape
    * `{index: {mappings: {properties: {f: {type: …}}}}}`. String fields
    * model the cluster's mapping mode: exact `keyword` on the default stub,
    * analyzed `text` WITH the dynamic-mapping `.keyword` raw subfield when
    * `analyzedPhrase=true` — so the connector's term-mode validation sees
    * exactly what a default-mapped cluster would serve. */
  private def mappingOf(pattern: String): String = {
    val names =
      if (!pattern.contains("*")) {
        require(allIndices.contains(pattern), s"no such index [$pattern]")
        Seq(pattern)
      } else {
        val rx = ("^" + pattern.split("\\*", -1)
          .map(java.util.regex.Pattern.quote).mkString(".*") + "$").r
        allIndices.keys.toSeq.filter(rx.matches(_)).sorted
      }
    val root = mapper.createObjectNode()
    names.foreach { n =>
      val props = root.putObject(n).putObject("mappings").putObject("properties")
      val data  = allIndices(n)
      colNames.zipWithIndex.foreach { case (c, i) =>
        val v = data.iterator.map(_(i)).find(_ != null).orNull
        val t = v match {
          case _: String                           => if (analyzedPhrase) "text" else "keyword"
          case _: java.lang.Long | _: java.lang.Integer => "long"
          case _: java.lang.Double | _: java.lang.Float => "double"
          case _: java.lang.Boolean                => "boolean"
          case _: java.sql.Timestamp | _: Instant  => "date"
          case _                                   => "keyword"
        }
        val fm = props.putObject(c)
        fm.put("type", t)
        if (t == "text")
          fm.putObject("fields").putObject("keyword")
            .put("type", "keyword").put("ignore_above", 256)
      }
    }
    root.toString
  }

  private def initialSearch(body: String, data: IndexedSeq[Array[Any]]): String = {
    searchCalls.incrementAndGet()
    lastSearchBody = body
    val req = mapper.readTree(body)
    if (req.has("aggs") || req.path("size").asInt(10) == 0) return aggSearch(req, data)
    val size = if (req.has("size")) req.get("size").asInt() else 10
    val slice = req.path("slice")
    val (sliceId, sliceMax) =
      if (slice.isObject) (slice.get("id").asInt(), slice.get("max").asInt()) else (0, 1)
    val cols: Array[String] =
      if (req.path("_source").isArray) {
        val a = req.get("_source").asInstanceOf[ArrayNode]
        (0 until a.size).map(a.get(_).asText()).toArray
      } else colNames
    val q   = req.path("query")
    val ids = data.indices.iterator
      .filter(i => i % sliceMax == sliceId && evalQuery(q, data(i)))
      .toArray
    val id  = s"$index:${UUID.randomUUID().toString}"
    val ctx = Ctx(data, ids, cols, size, 0)
    contexts.put(id, ctx)
    pageResponse(id, ctx)
  }

  /** `size:0` search: grand total via `track_total_hits`, and the paged
    * `composite` aggregation (buckets in ascending key order, resumed with
    * `after` — the exhaustive-enumeration contract the connector's
    * aggregate pushdown relies on). No scroll context is created. */
  private def aggSearch(req: JsonNode, data: IndexedSeq[Array[Any]]): String = {
    aggCalls.incrementAndGet()
    val q        = req.path("query")
    val matching = data.indices.filter(i => evalQuery(q, data(i)))
    val root     = mapper.createObjectNode()
    root.putObject("hits").putObject("total").put("value", matching.length).put("relation", "eq")
    val aggs = req.path("aggs")
    if (aggs.isObject) {
      val aggName = aggs.fieldNames().next()
      val maxAgg  = aggs.get(aggName).path("max")
      if (maxAgg.isObject) { // metric agg: max of a numeric field (tail cursor probe)
        val f = maxAgg.get("field").asText()
        val mx = matching.iterator.map(i => field(data(i), f)).collect {
          case n: Number => n.doubleValue()
        }.foldLeft(Option.empty[Double])((acc, v) => Some(acc.fold(v)(math.max(_, v))))
        val g = root.putObject("aggregations").putObject(aggName)
        mx.fold { g.putNull("value"); () } { v => g.put("value", v); () }
        return root.toString
      }
      val comp = aggs.get(aggName).path("composite")
      require(comp.isObject, s"stub only implements composite/max aggregations, got: $aggs")
      val size   = comp.path("size").asInt(10)
      val srcs   = comp.get("sources")
      val fields = (0 until srcs.size).map { i =>
        val o    = srcs.get(i)
        val name = o.fieldNames().next()
        val t    = o.get(name).path("terms")
        (name, t.get("field").asText(), t.path("missing_bucket").asBoolean(false))
      }
      // real-ES composite semantics: a document missing a source's field is
      // SKIPPED unless that source declares missing_bucket:true (which then
      // emits it under a null key)
      val kept = matching.filter(i =>
        fields.forall { case (_, f, missing) => missing || field(data(i), f) != null })
      // composite buckets ascend element-wise in key order; `after` resumes
      // strictly past a key under the SAME total order
      val keyOrd: Ordering[Seq[Any]] = (a: Seq[Any], b: Seq[Any]) =>
        a.zip(b).iterator.map { case (x0, y0) =>
          (comparable(x0), comparable(y0)) match {
            case (null, null)           => 0
            case (null, _)              => -1
            case (_, null)              => 1
            case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
            case (x, y)                 => String.valueOf(x).compareTo(String.valueOf(y))
          }
        }.find(_ != 0).getOrElse(0)
      val grouped = kept
        .groupBy(i => fields.map { case (_, f, _) => field(data(i), f) }: Seq[Any])
        .toSeq
        .sortBy(_._1)(keyOrd)
      val after = comp.path("after")
      val page = (if (after.isObject) {
        val afterVals: Seq[Any] = fields.map { case (name, _, _) =>
          val n = after.get(name)
          if (n == null || n.isNull) null else queryVal(n)
        }
        grouped.dropWhile { case (k, _) => keyOrd.compare(k, afterVals) <= 0 }
      } else grouped).take(size)
      val g   = root.putObject("aggregations").putObject(aggName)
      val arr = g.putArray("buckets")
      page.foreach { case (k, is) =>
        val b   = arr.addObject()
        val key = b.putObject("key")
        fields.zip(k).foreach { case ((name, _, _), v) => putJson(key, name, v) }
        b.put("doc_count", is.length)
      }
      if (page.nonEmpty) {
        val ak = g.putObject("after_key")
        fields.zip(page.last._1).foreach { case ((name, _, _), v) => putJson(ak, name, v) }
      }
    }
    root.toString
  }

  private def scrollNext(body: String): String = {
    scrollCalls.incrementAndGet()
    val id  = mapper.readTree(body).path("scroll_id").asText()
    val ctx = contexts.get(id)
    require(ctx != null, s"unknown scroll_id $id") // ES: search_context_missing
    pageResponse(id, ctx)
  }

  private def clearScroll(body: String): String = {
    val idsNode = mapper.readTree(body).path("scroll_id")
    val ids =
      if (idsNode.isArray) (0 until idsNode.size).map(idsNode.get(_).asText())
      else Seq(idsNode.asText())
    var n = 0
    ids.foreach(i => if (contexts.remove(i) != null) n += 1)
    clearedScrolls.addAndGet(n)
    s"""{"succeeded":true,"num_freed":$n}"""
  }

  private def pageResponse(id: String, ctx: Ctx): String = synchronized {
    val root = mapper.createObjectNode()
    root.put("_scroll_id", id)
    val hitsObj = root.putObject("hits")
    hitsObj.putObject("total").put("value", ctx.ids.length).put("relation", "eq")
    val arr  = hitsObj.putArray("hits")
    val end  = math.min(ctx.pos + ctx.pageSize, ctx.ids.length)
    var k = ctx.pos
    while (k < end) {
      val rowIdx = ctx.ids(k)
      val hit = arr.addObject()
      hit.put("_index", index)
      hit.put("_id", rowIdx.toString)
      if (malformedEvery > 0 && (k + 1) % malformedEvery == 0)
        hit.put("_source", 42) // not an object: the connector must skip it
      else {
        val src = hit.putObject("_source")
        ctx.cols.foreach { c =>
          val ci = colNames.indexOf(c)
          if (ci >= 0) putJson(src, c, ctx.data(rowIdx)(ci))
        }
      }
      hitsServed.incrementAndGet()
      k += 1
    }
    ctx.pos = end
    root.toString
  }

  private def putJson(n: ObjectNode, k: String, v: Any): Unit = v match {
    case null                  => n.putNull(k)
    case s: String             => n.put(k, s)
    case i: Int                => n.put(k, i)
    case l: Long               => n.put(k, l)
    case d: Double             => n.put(k, d)
    case f: Float              => n.put(k, f.toDouble)
    case b: Boolean            => n.put(k, b)
    case t: java.sql.Timestamp => n.put(k, t.toInstant.toString)
    case d: java.sql.Date      => n.put(k, d.toString)
    case other                 => n.put(k, String.valueOf(other))
  }

  // ---- query DSL evaluation over a seeded row -------------------------

  /** A `.keyword` suffix addresses the raw keyword subfield of a
    * default-mapped text field — on this stub (as on real ES for values
    * under ignore_above) that IS the stored value. */
  private def field(row: Array[Any], name: String): Any = {
    val base = if (name.endsWith(".keyword")) name.stripSuffix(".keyword") else name
    val i    = colNames.indexOf(base)
    if (i < 0) null else row(i)
  }

  /** Comparable form: timestamps → epoch micros, numbers → double. */
  private def comparable(v: Any): Any = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case n: Number             => n.doubleValue()
    case other                 => other
  }

  private def queryVal(n: JsonNode): Any =
    if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else {
      val s = n.asText()
      try { val i = Instant.parse(s); i.getEpochSecond * 1000000L + i.getNano / 1000L }
      catch { case _: Exception => s }
    }

  private def cmp(a: Any, b: Any): Option[Int] = (comparable(a), b) match {
    case (null, _)              => None
    case (x: Long, y: Long)     => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double)   => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: Double, y: Long)   => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _                      => None
  }

  private def evalQuery(q: JsonNode, row: Array[Any]): Boolean = {
    if (q == null || q.isMissingNode || !q.isObject || q.size() == 0) return true
    val kind = q.fieldNames().next()
    val bodyN = q.get(kind)
    kind match {
      case "match_all" => true
      // `analyzedPhrase` models what REAL ES does to a match_phrase on an
      // analyzed text field: the query's token sequence matches anywhere
      // inside the document's token stream — "purchase" matches a doc whose
      // field is "purchase order". Off by default (exact), on for the spec
      // that proves the connector's phrase-mode re-filter repairs the
      // over-match; `term` is ALWAYS exact (the keyword semantics).
      case "match_phrase" if analyzedPhrase =>
        val f = bodyN.fieldNames().next()
        val vNode = bodyN.get(f)
        val v = queryVal(if (vNode.isObject) vNode.get("value") else vNode)
        (field(row, f), v) match {
          case (fv: String, qv: String) =>
            val ft = fv.split("\\s+").toSeq
            val qt = qv.split("\\s+").toSeq
            qt.nonEmpty && ft.sliding(qt.length).contains(qt)
          case (fv, qv) => cmp(fv, qv).contains(0)
        }
      case "match_phrase" | "term" =>
        val f = bodyN.fieldNames().next()
        val vNode = bodyN.get(f)
        val v = queryVal(if (vNode.isObject) vNode.get("value") else vNode)
        cmp(field(row, f), v).contains(0)
      case "terms" =>
        val f   = bodyN.fieldNames().next()
        val arr = bodyN.get(f)
        (0 until arr.size).exists(i => cmp(field(row, f), queryVal(arr.get(i))).contains(0))
      case "range" =>
        val f  = bodyN.fieldNames().next()
        val rq = bodyN.get(f)
        val v  = field(row, f)
        def ok(op: String, test: Int => Boolean): Boolean =
          !rq.has(op) || cmp(v, queryVal(rq.get(op))).exists(test)
        v != null && ok("gt", _ > 0) && ok("gte", _ >= 0) && ok("lt", _ < 0) && ok("lte", _ <= 0)
      case "exists" =>
        field(row, bodyN.get("field").asText()) != null
      case "bool" =>
        def all(name: String, p: Boolean => Boolean): Boolean = {
          val a = bodyN.path(name)
          !a.isArray || (0 until a.size).forall(i => p(evalQuery(a.get(i), row)))
        }
        val should = bodyN.path("should")
        val shouldOk = !should.isArray || should.size() == 0 ||
          (0 until should.size).exists(i => evalQuery(should.get(i), row))
        all("must", identity) && all("must_not", !_) && shouldOk
      case other => throw new IllegalArgumentException(s"stub does not implement query '$other'")
    }
  }
}

object EsStubServer {
  /** Seed a stub index from a DataFrame. The collect here is the TEST
    * DOUBLE's seed (the server impersonates the external ES cluster that
    * owns the data); it is bounded by fixture scale and is never an engine
    * execution path — the engine path is the HTTP read through
    * [[EsScrollSource]]. */
  def fromDataFrame(df: DataFrame, index: String, malformedEvery: Int = 0,
      rejectEvery: Int = 0, requireAuth: String = null): EsStubServer = {
    val (cols, data) = seedRows(df)
    new EsStubServer(index, cols, data, malformedEvery, rejectEvery, requireAuth = requireAuth)
  }

  /** Seed one index PER DAY of `tsCol` — the reference's time-partitioned
    * index layout (it discovers and exports `<name>-yyyy.MM.dd` daily
    * indices). The connector's window pruning is tested against this. */
  def fromDayPartitionedDataFrame(df: DataFrame, base: String, tsCol: String = "ts",
      requireAuth: String = null): EsStubServer = {
    val (cols, data) = seedRows(df)
    val ti = cols.indexOf(tsCol)
    require(ti >= 0, s"no $tsCol column to day-partition on")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy.MM.dd")
    val byDay = data.groupBy { row =>
      row(ti).asInstanceOf[java.sql.Timestamp]
        .toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDate.format(fmt)
    }
    val names = byDay.keys.toSeq.sorted
    new EsStubServer(s"$base-${names.head}", cols, byDay(names.head),
      extraIndices = names.tail.map(d => s"$base-$d" -> byDay(d)).toMap,
      requireAuth = requireAuth)
  }

  private def seedRows(df: DataFrame): (Array[String], IndexedSeq[Array[Any]]) = {
    val cols = df.columns
    (cols, df.collect().map(r => Array.tabulate[Any](cols.length)(r.get)).toIndexedSeq)
  }
}
