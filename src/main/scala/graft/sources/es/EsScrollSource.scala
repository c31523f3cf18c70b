package graft.sources.es

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.sources.SchemaInfer
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow, Offset => StreamOffset}
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
  *     filters compile to `bool`/`term`/`terms`/`range`/`exists` clauses in
  *     the search body (the reference pushes its `match_phrase(rule_name)`
  *     the same way), so non-matching documents never leave the server.
  *     Pushed state is visible in the scan description (`.explain` shows
  *     `PushedEsQuery`).
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
  * String-equality semantics (`stringEquality` option): against a real ES
  * endpoint `match_phrase` performs ANALYZED matching (a doc with
  * event_type "purchase order" matches `event_type = 'purchase'`, and case
  * folds), so it can NOT be trusted as exact equality.
  *   - `term` (default): `EqualTo`/`In` on strings compile to `term`/
  *     `terms` on `field + keywordSuffix` — exact on keyword-mapped fields.
  *     Set `keywordSuffix=.keyword` for indices using the default dynamic
  *     mapping (text with a raw keyword subfield). Trusted exact → fully
  *     pushed, composes with aggregate pushdown.
  *   - `phrase`: the reference's own operator (match_phrase, reference
  *     parity). Pushed for server-side traffic reduction but reported back
  *     to Spark as post-scan filters, so Spark re-evaluates exact equality
  *     over whatever the analyzer returned; a string equality under `Not`
  *     is not pushed at all (an over-matching phrase inside must_not would
  *     under-return, which no re-filter can repair).
  *
  * NULL semantics of pushed `Not`: ES `must_not` MATCHES documents where
  * the field is missing, while Spark's `NOT(a = v)` evaluates to NULL on a
  * null `a` and drops the row. A pushed `Not(leaf)` therefore compiles as
  * `bool{must:[exists(field)], must_not:[leaf]}` — the exists guard
  * reproduces Spark's null-dropping three-valued logic exactly
  * (`Not(IsNotNull(a))` alone compiles to a bare must_not/exists, since
  * IsNotNull never evaluates to NULL). `Not` over And/Or is left for Spark
  * (sound per-branch null analysis isn't expressible as one guard).
  *
  * Auth/TLS (beyond the reference, which connects plain-http —
  * Bootstrap.java:262): `user`+`password` options attach an HTTP Basic
  * `Authorization` header, `apiKey` attaches `ApiKey <key>`; both travel in
  * [[EsConn]] to every executor-side reader, so sliced fan-out stays
  * authenticated. An `https://` url uses the JDK client's default
  * truststore; `insecureTls=true` opts into a trust-all context for
  * self-signed dev clusters.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.es.EsScrollSource")
  *     .schema(eventsSchema)                   // or omit → sampled inference
  *     .option("url", "https://host:9200")
  *     .option("user", "elastic").option("password", "…")
  *     .option("index", "events")
  *     .option("slices", 8)
  *     .option("pageSize", 2000)
  *     .option("keywordSuffix", ".keyword")    // default-mapped text fields
  *     .load()
  *     .where($"event_type" === "purchase")    // pushed as an exact term
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
    val conn   = EsScrollSource.connOf(options)
    val index  = EsScrollSource.resolveIndices(conn,
      EsScrollSource.reqOption(options, "index")).mkString(",")
    val sample = options.getInt("inferSample", 100)
    val body   = s"""{"size":$sample,"query":{"match_all":{}}}"""
    val resp   = EsScrollSource.post(conn, s"/$index/_search", body)
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

/** Connection descriptor shipped inside every InputPartition: endpoint url,
  * the `Authorization` header value to attach ("" = none), and whether to
  * accept self-signed TLS certificates on https endpoints. Serializable
  * data only — each executor-side reader reconstructs nothing. */
private[es] case class EsConn(
    url: String,
    auth: String = "",
    insecureTls: Boolean = false
)

object EsScrollSource {
  private[es] def reqOption(o: CaseInsensitiveStringMap, k: String): String = {
    val v = o.get(k)
    require(v != null, s"es-scroll source requires option '$k'")
    v
  }

  /** CaseInsensitiveStringMap has NO two-arg get — a bare
    * `o.get(k, default)` silently auto-tuples into `get((k, default))` and
    * returns null. All defaulted string options must come through here. */
  private[es] def optOrElse(o: CaseInsensitiveStringMap, k: String, default: String): String = {
    val v = o.get(k)
    if (v == null) default else v
  }

  /** The `Authorization` header value for the two ES client auth schemes:
    * `apiKey` wins over `user`/`password`; absent both, empty (the
    * reference's plain connection). */
  private[es] def authHeader(apiKey: String, user: String, password: String): String =
    if (apiKey != null && apiKey.nonEmpty) s"ApiKey $apiKey"
    else if (user != null && user.nonEmpty)
      "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$user:${Option(password).getOrElse("")}".getBytes(StandardCharsets.UTF_8))
    else ""

  /** Build the connection descriptor from reader options. */
  private[es] def connOf(o: CaseInsensitiveStringMap): EsConn =
    EsConn(
      reqOption(o, "url"),
      authHeader(o.get("apiKey"), o.get("user"), optOrElse(o, "password", "")),
      o.getBoolean("insecureTls", false)
    )

  private val client = HttpClient.newHttpClient()

  /** Trust-all client for `insecureTls=true` against self-signed https dev
    * clusters — never the default; plain-http and CA-signed https use the
    * JDK default client above. */
  private lazy val insecureClient: HttpClient = {
    val trustAll = new javax.net.ssl.X509TrustManager {
      override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
    }
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](trustAll), new java.security.SecureRandom)
    HttpClient.newBuilder().sslContext(ctx).build()
  }

  /** Transient-failure policy: ES sheds load with 429 (es_rejected_execution)
    * and proxies/overload answer 502/503/504; a long export WILL see these and
    * must retry with backoff rather than fail the Spark task (a task retry
    * would restart the whole slice's scroll from scratch). 4xx other than 429
    * is a caller bug — fail fast (401/403 in particular: bad credentials must
    * surface immediately, not after a backoff storm). Retries are safe because
    * the stub (and real ES) reject before mutating scroll-context state. */
  private val MaxRetries  = 4
  private val RetryBaseMs = 50L
  private def retryable(status: Int): Boolean =
    status == 429 || status == 502 || status == 503 || status == 504

  private[es] def post(conn: EsConn, path: String, body: String): String =
    send(conn, HttpRequest.newBuilder(URI.create(conn.url + path))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)))

  private[es] def delete(conn: EsConn, path: String, body: String): String =
    send(conn, HttpRequest.newBuilder(URI.create(conn.url + path))
      .header("Content-Type", "application/json")
      .method("DELETE", HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)))

  private[es] def get(conn: EsConn, path: String): String =
    send(conn, HttpRequest.newBuilder(URI.create(conn.url + path)).GET())

  /** Resolve an index name or `*` pattern to concrete indices. Patterns list
    * the cluster's indices (`GET /_cat/indices?format=json` — the discovery
    * call the reference's Bootstrap makes before exporting) and glob-match
    * client-side. Sorted for deterministic partition planning. */
  private[es] def resolveIndices(conn: EsConn, pattern: String): Seq[String] =
    if (!pattern.contains("*")) Seq(pattern)
    else {
      val arr = new ObjectMapper().readTree(get(conn, "/_cat/indices?format=json"))
      val rx  = ("^" + pattern.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*") + "$").r
      (0 until arr.size).map(arr.get(_).path("index").asText())
        .filter(n => rx.matches(n)).sorted
    }

  /** PUBLIC discovery surface for callers composing the reference's whole
    * program (Cli's `--es` mode): the concrete indices matching `pattern`
    * (via `_cat/indices`, the reference's Bootstrap discovery call) with
    * their parsed day suffixes — the CLI derives its export window from
    * the latest day, exactly as the reference derives it from its daily
    * index names (Bootstrap.java:259-268). */
  def discoverDailyIndices(
      url: String,
      pattern: String,
      user: String = "",
      password: String = "",
      apiKey: String = "",
      insecureTls: Boolean = false
  ): Seq[(String, Option[java.time.LocalDate])] =
    resolveIndices(
      EsConn(url, authHeader(apiKey, user, password), insecureTls),
      pattern
    ).map(n => n -> indexDay(n))

  /** The UTC day a time-partitioned index covers, from its `-yyyy.MM.dd`
    * suffix (the reference's daily-index naming); None = not day-suffixed,
    * never pruned. */
  private[es] def indexDay(name: String): Option[java.time.LocalDate] = {
    val i = name.lastIndexOf('-')
    if (i < 0) None
    else
      try Some(java.time.LocalDate.parse(name.substring(i + 1).replace('.', '-')))
      catch { case _: Exception => None }
  }

  /** Conjunctive [lo, hi] micros bounds the pushed filters imply for
    * `tsCol`. Only top-level filters and And-branches contribute (an Or
    * bound would not be conjunctive); gt-vs-gte slack is irrelevant because
    * the bounds are used only for WHOLE-DAY pruning, never row filtering. */
  private[es] def tsBounds(filters: Array[Filter], tsCol: String): (Option[Long], Option[Long]) = {
    def micros(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp => Some(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case i: Instant            => Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case _                     => None
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tighten(l: Option[Long], h: Option[Long]): Unit = {
      l.foreach(m => lo = Some(lo.fold(m)(math.max(_, m))))
      h.foreach(m => hi = Some(hi.fold(m)(math.min(_, m))))
    }
    def visit(f: Filter): Unit = f match {
      case And(l, r)                                => visit(l); visit(r)
      case GreaterThan(a, v) if a == tsCol          => tighten(micros(v), None)
      case GreaterThanOrEqual(a, v) if a == tsCol   => tighten(micros(v), None)
      case LessThan(a, v) if a == tsCol             => tighten(None, micros(v))
      case LessThanOrEqual(a, v) if a == tsCol      => tighten(None, micros(v))
      case EqualTo(a, v) if a == tsCol              => tighten(micros(v), micros(v))
      case _                                        => ()
    }
    filters.foreach(visit)
    (lo, hi)
  }

  /** Window pruning at the INDEX level — the reference's O2 (it only
    * exports the daily indices its query window touches), here driven by
    * the pushed ts-range filters: a day-suffixed index is dropped iff its
    * whole [day, day+1) micros interval provably misses [lo, hi]. Pruned
    * indices never receive a request. */
  private[es] def pruneByWindow(
      indices: Seq[String],
      pushed: Array[Filter],
      tsCol: String
  ): Seq[String] = {
    val (lo, hi) = tsBounds(pushed, tsCol)
    if (lo.isEmpty && hi.isEmpty) indices
    else
      indices.filter { idx =>
        indexDay(idx) match {
          case Some(d) =>
            val start = d.toEpochDay * 86400000000L
            val end   = start + 86400000000L
            !(hi.exists(_ < start) || lo.exists(_ >= end))
          case None => true
        }
      }
  }

  private def send(conn: EsConn, b0: HttpRequest.Builder): String = {
    val b   = if (conn.auth.nonEmpty) b0.header("Authorization", conn.auth) else b0
    val cl  = if (conn.insecureTls && conn.url.startsWith("https")) insecureClient else client
    val req = b.build()
    var attempt = 0
    while (true) {
      val resp =
        try cl.send(req, HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.io.IOException if attempt < MaxRetries =>
            attempt += 1
            Thread.sleep(RetryBaseMs << (attempt - 1))
            null // connection-level blip (reset, refused during failover): retry
        }
      if (resp != null) {
        if (resp.statusCode() / 100 == 2) return resp.body()
        require(retryable(resp.statusCode()) && attempt < MaxRetries,
          s"ES request failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}" +
            (if (retryable(resp.statusCode())) s" after $attempt retries" else ""))
        attempt += 1
        Thread.sleep(RetryBaseMs << (attempt - 1))
      }
    }
    sys.error("unreachable")
  }

  /** Compile accepted Spark source filters to an ES query-DSL JSON string.
    * String equalities follow `stringEquality` (see the class doc): exact
    * `term`/`terms` on `field + keywordSuffix`, or the reference's
    * `match_phrase` with Spark re-evaluation. `Not(leaf)` carries the
    * exists() null guard; unsupported shapes are rejected in [[supported]]
    * and left for Spark to evaluate. */
  private[es] def toEsQuery(
      filters: Array[Filter],
      stringEquality: String = "term",
      keywordSuffix: String = ""
  ): String = {
    val m = new ObjectMapper
    // keyword-suffixed field for exact string matching in term mode; the
    // base name everywhere else (ranges, exists, non-string equality)
    def kw(a: String): String =
      if (stringEquality == "term" && keywordSuffix.nonEmpty) a + keywordSuffix else a
    def clause(f: Filter): ObjectNode = {
      val n = m.createObjectNode()
      f match {
        case EqualTo(a, v: String) =>
          if (stringEquality == "phrase") n.putObject("match_phrase").put(a, v)
          else n.putObject("term").put(kw(a), v)
        case EqualTo(a, v)         => putVal(n.putObject("term"), a, v)
        case In(a, vs) =>
          val allStrings = vs.nonEmpty && vs.forall(_.isInstanceOf[String])
          val arr = n.putObject("terms").putArray(if (allStrings) kw(a) else a)
          vs.foreach(v => putArr(arr, v))
        case GreaterThan(a, v)        => putVal(n.putObject("range").putObject(a), "gt", v)
        case GreaterThanOrEqual(a, v) => putVal(n.putObject("range").putObject(a), "gte", v)
        case LessThan(a, v)           => putVal(n.putObject("range").putObject(a), "lt", v)
        case LessThanOrEqual(a, v)    => putVal(n.putObject("range").putObject(a), "lte", v)
        case IsNotNull(a)             => n.putObject("exists").put("field", a)
        case IsNull(a) =>
          n.putObject("bool").putArray("must_not")
            .addObject().putObject("exists").put("field", a)
        case And(l, r) =>
          val must = n.putObject("bool").putArray("must")
          must.add(clause(l)); must.add(clause(r))
        case Or(l, r) =>
          val b = n.putObject("bool")
          val should = b.putArray("should")
          should.add(clause(l)); should.add(clause(r))
          b.put("minimum_should_match", 1)
        // NOT(a IS NOT NULL) = a IS NULL: IsNotNull never evaluates to
        // NULL, so the bare negation IS Spark's semantics — no guard.
        case Not(IsNotNull(a)) =>
          n.putObject("bool").putArray("must_not")
            .addObject().putObject("exists").put("field", a)
        // NOT(a IS NULL) = a IS NOT NULL — same never-NULL leaf, no guard.
        case Not(IsNull(a)) => n.putObject("exists").put("field", a)
        // NOT(leaf) over a nullable field: Spark drops null rows (the leaf
        // evaluates to NULL, NOT(NULL) = NULL), ES must_not would KEEP
        // them — the exists guard restores Spark's semantics.
        case Not(c) =>
          val b    = n.putObject("bool")
          val must = b.putArray("must")
          c.references.foreach(a => must.addObject().putObject("exists").put("field", a))
          b.putArray("must_not").add(clause(c))
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

  /** Full type coverage mirroring [[putVal]] — a Float or Timestamp inside
    * `In(...)` must serialize as a JSON number / ISO instant, not
    * `String.valueOf`, or the terms array silently matches nothing. */
  private def putArr(a: ArrayNode, v: Any): Unit = v match {
    case s: String             => a.add(s)
    case i: Int                => a.add(i)
    case l: Long               => a.add(l)
    case d: Double             => a.add(d)
    case f: Float              => a.add(f.toDouble)
    case b: Boolean            => a.add(b)
    case t: java.sql.Timestamp => a.add(t.toInstant.toString)
    case i: Instant            => a.add(i.toString)
    case d: java.sql.Date      => a.add(d.toString)
    case other                 => a.add(String.valueOf(other))
  }

  private[es] def supported(f: Filter): Boolean = f match {
    case EqualTo(_, null)                             => false
    case In(_, vs) if vs == null || vs.contains(null) => false // null ∈ IN is three-valued; not expressible as terms
    case EqualTo(_, _) | In(_, _) | IsNotNull(_) | IsNull(_) => true
    case GreaterThan(_, _) | GreaterThanOrEqual(_, _) => true
    case LessThan(_, _) | LessThanOrEqual(_, _)       => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r)  => supported(l) && supported(r)
    // Not compiles with an exists() guard reproducing Spark's null-dropping
    // semantics — sound only for a single-field leaf. A Not over And/Or
    // would need per-branch null analysis (NOT(a=1 AND b=9) keeps a row
    // with a null `a` when b≠9), so it stays with Spark.
    case Not(c) => c match {
      case EqualTo(_, v)                                => v != null
      case In(_, vs)                                    => vs != null && !vs.contains(null)
      case GreaterThan(_, _) | GreaterThanOrEqual(_, _) => true
      case LessThan(_, _) | LessThanOrEqual(_, _)       => true
      case IsNotNull(_) | IsNull(_)                     => true
      case _                                            => false
    }
    case _ => false
  }

  /** Fields carrying a pushed string equality/membership — the ones whose
    * `term`/`terms` compilation silently under-matches when the live
    * mapping analyzes them (see [[validateTermFields]]). */
  private[es] def stringEqFields(f: Filter): Seq[String] = f match {
    case EqualTo(a, _: String)                                       => Seq(a)
    case In(a, vs) if vs != null && vs.exists(_.isInstanceOf[String]) => Seq(a)
    case And(l, r)                                                   => stringEqFields(l) ++ stringEqFields(r)
    case Or(l, r)                                                    => stringEqFields(l) ++ stringEqFields(r)
    case Not(c)                                                      => stringEqFields(c)
    case _                                                           => Nil
  }

  /** Term-mode mapping validation (r13 ADVICE): against a default-mapped
    * cluster (analyzed `text` with a `.keyword` raw subfield) a `term` on
    * the BASE field matches single analyzed tokens, so multi-token or
    * case-differing equality silently returns wrong (usually empty)
    * results unless `keywordSuffix=.keyword` is set. One
    * `GET /<index>/_mapping` at scan construction fails that
    * misconfiguration FAST:
    *   - empty suffix → every string-equality field must NOT be mapped
    *     `text` (plain `keyword` is the exact-match mapping);
    *   - configured suffix → the subfield must exist and be `keyword`
    *     (a suffix pointing at nothing is an always-empty term).
    * A cluster (or stub) without the endpoint — or without the field —
    * skips validation: absence of evidence is not a misconfiguration. */
  private[es] def validateTermFields(
      conn: EsConn,
      index: String,
      fields: Seq[String],
      keywordSuffix: String
  ): Unit = {
    if (fields.isEmpty) return
    val root =
      try new ObjectMapper().readTree(get(conn, s"/$index/_mapping"))
      catch { case _: Exception => return }
    val it = root.fields()
    while (it.hasNext) {
      val e     = it.next()
      val props = e.getValue.path("mappings").path("properties")
      fields.foreach { f =>
        val fm = props.path(f)
        if (!fm.isMissingNode) {
          val t = fm.path("type").asText("")
          if (keywordSuffix.nonEmpty) {
            val subT = fm.path("fields").path(keywordSuffix.stripPrefix(".")).path("type").asText("")
            require(subT == "keyword",
              s"es-scroll: exact string equality pushed as term on '$f$keywordSuffix', but index " +
                s"'${e.getKey}' maps '$f' (type '$t') without a keyword '$keywordSuffix' subfield — " +
                "fix keywordSuffix, or set stringEquality=phrase for analyzed matching with Spark re-filter")
          } else
            require(t != "text",
              s"es-scroll: exact string equality pushed as term on analyzed text field '$f' " +
                s"(index '${e.getKey}') — this matches single analyzed tokens, not exact values; " +
                "set keywordSuffix=.keyword for default-mapped indices, or stringEquality=phrase")
        }
      }
    }
  }

  /** Does `f` contain a string equality/membership anywhere? (In `phrase`
    * mode those compile to analyzed match_phrase and must be re-evaluated
    * by Spark.) */
  private[es] def containsStringEq(f: Filter): Boolean = f match {
    case EqualTo(_, _: String) => true
    case In(_, vs)             => vs != null && vs.exists(_.isInstanceOf[String])
    case And(l, r)             => containsStringEq(l) || containsStringEq(r)
    case Or(l, r)              => containsStringEq(l) || containsStringEq(r)
    case Not(c)                => containsStringEq(c)
    case _                     => false
  }

  /** Is `f` safe to push as a SUPERSET in `phrase` mode? A match_phrase
    * over-matches, which is harmless under must/should (Spark's re-filter
    * trims the extras) but destructive under must_not (rows the analyzer
    * over-matched are excluded server-side and can never come back). */
  private[es] def phraseSafe(f: Filter): Boolean = f match {
    case Not(c)    => !containsStringEq(c)
    case And(l, r) => phraseSafe(l) && phraseSafe(r)
    case Or(l, r)  => phraseSafe(l) && phraseSafe(r)
    case _         => true
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
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EsScanBuilder(
      schema0,
      EsScrollSource.connOf(options),
      EsScrollSource.reqOption(options, "index"),
      options.getInt("slices", 4),
      options.getInt("pageSize", 1000),
      EsScrollSource.optOrElse(options, "scroll", "3m"), // the reference's TimeValue.timeValueMinutes(3)
      EsScrollSource.optOrElse(options, "timeField", "ts"), // drives index-level window pruning
      EsScrollSource.optOrElse(options, "pagination", "scroll"), // or "search_after" (PIT)
      EsScrollSource.optOrElse(options, "cursorField", "event_id"), // streaming tail cursor
      options.getLong("maxIdsPerBatch", 1000L), // streaming admission: cursor-value step per epoch
      EsScrollSource.optOrElse(options, "stringEquality", "term"), // or "phrase" (reference parity + re-filter)
      EsScrollSource.optOrElse(options, "keywordSuffix", "") // e.g. ".keyword" for default-mapped text
    )
}

private class EsScanBuilder(
    full: StructType,
    conn: EsConn,
    index: String,
    slices: Int,
    pageSize: Int,
    scroll: String,
    timeField: String,
    pagination: String,
    cursorField: String = "event_id",
    maxIdsPerBatch: Long = 1000L,
    stringEquality: String = "term",
    keywordSuffix: String = ""
) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType  = full
  private var pushed: Array[Filter] = Array.empty
  private var postScan: Array[Filter] = Array.empty
  private var limit: Option[Int]    = None
  private var aggGroups: Array[StructField] = null // null = no aggregate pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Pushdown with per-mode exactness: in `term` mode every supported
    * filter is exact and fully pushed; in `phrase` mode filters containing
    * a string equality are pushed only when superset-safe (see
    * [[EsScrollSource.phraseSafe]]) and ALWAYS handed back to Spark for
    * exact re-evaluation (returning them here is the DSv2 contract for
    * inexact pushdown). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(f =>
      EsScrollSource.supported(f) && refsKnownCols(f) &&
        (stringEquality != "phrase" || EsScrollSource.phraseSafe(f)))
    pushed = ok
    postScan =
      if (stringEquality == "phrase") rest ++ ok.filter(EsScrollSource.containsStringEq)
      else rest
    postScan
  }
  private def refsKnownCols(f: Filter): Boolean =
    f.references.forall(full.fieldNames.contains)
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean =
    if (aggGroups != null) false else { limit = Some(l); true }

  /** COUNT(*) [GROUP BY cols] served by the ES aggregation endpoint — the
    * reference's server-side discovery aggregation
    * (the terms/count request its Bootstrap issues before exporting). The
    * wire form is a paged `composite` aggregation (the documented ES
    * mechanism for EXHAUSTIVE bucket enumeration — a plain `terms` agg
    * truncates at `size` with an error bound, which a declared query can
    * never ship on) with `missing_bucket:true` per source (ES otherwise
    * SKIPS documents missing the group field, while Spark's groupBy emits
    * a null group); grand-total COUNT(*) uses `track_total_hits`. Partial
    * pushdown (supportCompletePushDown stays false): the scan emits exact
    * (group, count) rows and Spark's final aggregate merges — a no-op over
    * the single result partition, but keeps the plan correct if Spark ever
    * splits the scan. Refused when a post-scan filter exists (phrase-mode
    * string equality): the server would count analyzer-matched docs, not
    * Spark-equal ones. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val groupCols = agg.groupByExpressions.flatMap {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
      case _                                               => None
    }
    val ok = groupCols.length == agg.groupByExpressions.length &&
      groupCols.forall(full.fieldNames.contains) &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar] &&
      limit.isEmpty && postScan.isEmpty
    if (ok) aggGroups = groupCols.map(full(_))
    ok
  }

  override def build(): Scan = {
    if (stringEquality == "term")
      EsScrollSource.validateTermFields(
        conn, index,
        pushed.flatMap(EsScrollSource.stringEqFields).distinct.toSeq,
        keywordSuffix)
    if (aggGroups != null)
      new EsAggScan(conn, index, pageSize,
        EsScrollSource.toEsQuery(pushed, stringEquality, keywordSuffix),
        pushed, aggGroups, timeField, keywordSuffix)
    else
      new EsScrollScan(conn, index, slices, pageSize, scroll, required,
        EsScrollSource.toEsQuery(pushed, stringEquality, keywordSuffix),
        pushed, limit, timeField, pagination, cursorField, maxIdsPerBatch)
  }
}

private case class EsAggPartition(
    conn: EsConn,
    index: String,
    queryJson: String,
    pageSize: Int,
    groupNames: Array[String],
    groupTypesJson: String,
    keywordSuffix: String
) extends InputPartition

/** Scan for a pushed COUNT(*) [GROUP BY cols]: one input partition (the
  * result is O(distinct groups), already reduced server-side), driving a
  * paged composite aggregation — raw documents never cross the wire. */
private class EsAggScan(
    conn: EsConn,
    index: String,
    pageSize: Int,
    queryJson: String,
    pushed: Array[Filter],
    groups: Array[StructField],
    timeField: String,
    keywordSuffix: String
) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(groups :+ StructField("count(*)", LongType, nullable = false))
  override def toBatch: Batch = this
  override def description(): String =
    s"es-scroll index=$index PushedAggregation: [COUNT(*)" +
      (if (groups.nonEmpty) s" GROUP BY ${groups.map(_.name).mkString(", ")}" else "") +
      s"], PushedEsQuery: $queryJson, PushedFilters: [${pushed.mkString(", ")}]"
  /** Surviving indices comma-join into ONE multi-index search (the ES
    * form) — the server merges buckets across them; window-pruned indices
    * never appear in the path. */
  override def planInputPartitions(): Array[InputPartition] = {
    val kept = EsScrollSource.pruneByWindow(
      EsScrollSource.resolveIndices(conn, index), pushed, timeField)
    if (kept.isEmpty) Array.empty
    else
      Array(EsAggPartition(conn, kept.mkString(","), queryJson, pageSize,
        groups.map(_.name), StructType(groups).json, keywordSuffix))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new EsAggReader(p.asInstanceOf[EsAggPartition])
    }
}

private class EsAggReader(p: EsAggPartition) extends PartitionReader[InternalRow] {
  private val mapper     = new ObjectMapper
  private val groupTypes = DataType.fromJson(p.groupTypesJson).asInstanceOf[StructType].fields
  private var buckets: JsonNode      = _ // current composite page
  private var afterKey: JsonNode     = _
  private var pos                    = 0
  private var done                   = false
  private var totalEmitted           = false // grand-total (no groups) mode
  private var row: InternalRow       = _

  private def request(): JsonNode = {
    val root = mapper.createObjectNode()
    root.put("size", 0)
    root.set[ObjectNode]("query", mapper.readTree(p.queryJson).asInstanceOf[ObjectNode])
    if (p.groupNames.isEmpty) root.put("track_total_hits", true)
    else {
      val comp = root.putObject("aggs").putObject("g").putObject("composite")
      comp.put("size", p.pageSize)
      val srcs = comp.putArray("sources")
      groupTypes.foreach { gf =>
        // keyword subfield for string group keys (composite terms over an
        // analyzed text field would group by TOKEN on real ES); the SOURCE
        // NAME stays the column name, so bucket keys decode unchanged
        val fieldName =
          if (gf.dataType == StringType && p.keywordSuffix.nonEmpty) gf.name + p.keywordSuffix
          else gf.name
        val t = srcs.addObject().putObject(gf.name).putObject("terms")
        t.put("field", fieldName)
        // real ES SKIPS docs missing the field unless told otherwise;
        // Spark's groupBy emits a null group — missing_bucket aligns them
        t.put("missing_bucket", true)
      }
      if (afterKey != null && afterKey.isObject)
        comp.set[ObjectNode]("after", afterKey.asInstanceOf[ObjectNode])
    }
    mapper.readTree(EsScrollSource.post(p.conn, s"/${p.index}/_search", root.toString))
  }

  override def next(): Boolean = {
    if (p.groupNames.isEmpty) {
      if (totalEmitted) return false
      val n = request().path("hits").path("total").path("value").asLong()
      row = new GenericInternalRow(Array[Any](n))
      totalEmitted = true
      return true
    }
    while (!done && (buckets == null || pos >= buckets.size())) {
      if (buckets != null && buckets.size() < p.pageSize) { done = true; return false }
      val agg = request().path("aggregations").path("g")
      buckets = agg.path("buckets")
      afterKey = agg.path("after_key")
      pos = 0
      if (buckets.size() == 0) { done = true; return false }
    }
    if (done) return false
    val b    = buckets.get(pos)
    val key  = b.path("key")
    val vals = new Array[Any](groupTypes.length + 1)
    var i = 0
    while (i < groupTypes.length) {
      // a missing_bucket key arrives as JSON null → toInternal yields the
      // null group value, matching Spark's groupBy on a null field
      vals(i) = EsScrollSource.toInternal(key.get(groupTypes(i).name), groupTypes(i).dataType)
      i += 1
    }
    vals(groupTypes.length) = b.path("doc_count").asLong()
    row = new GenericInternalRow(vals)
    pos += 1
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = () // no server-side context to clear
}

private case class EsSlicePartition(
    sliceId: Int,
    sliceMax: Int,
    conn: EsConn,
    index: String,
    queryJson: String,
    pageSize: Int,
    scroll: String,
    schemaJson: String,
    limit: Int, // -1 = unlimited
    pagination: String // "scroll" (reference parity) | "search_after" (PIT)
) extends InputPartition

private class EsScrollScan(
    conn: EsConn,
    index: String,
    slices: Int,
    pageSize: Int,
    scroll: String,
    required: StructType,
    queryJson: String,
    pushed: Array[Filter],
    limit: Option[Int],
    timeField: String,
    pagination: String,
    cursorField: String = "event_id",
    maxIdsPerBatch: Long = 1000L
) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EsTailStream(conn, index, slices, pageSize, scroll, required,
      queryJson, cursorField, maxIdsPerBatch)
  override def description(): String =
    s"es-scroll index=$index slices=$slices pagination=$pagination PushedEsQuery: $queryJson, " +
      s"PushedFilters: [${pushed.mkString(", ")}]${limit.fold("")(l => s", PushedLimit: $l")}"

  /** One partition per (surviving index × slice): pattern indices resolve
    * via `_cat/indices` and day-suffixed ones outside the pushed ts window
    * are pruned on the DRIVER (partition planning, exactly where Spark
    * prunes catalog partitions) — executors scroll only surviving indices. */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val kept = EsScrollSource.pruneByWindow(
      EsScrollSource.resolveIndices(conn, index), pushed, timeField)
    (for { idx <- kept; i <- 0 until n } yield
      EsSlicePartition(i, n, conn, idx, queryJson,
        limit.fold(pageSize)(l => math.min(pageSize, math.max(1, l))),
        scroll, required.json, limit.getOrElse(-1), pagination): InputPartition
    ).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val sp = p.asInstanceOf[EsSlicePartition]
        if (sp.pagination == "search_after") new EsPitReader(sp) else new EsScrollReader(sp)
      }
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
      EsScrollSource.post(p.conn, s"/${p.index}/_search?scroll=${p.scroll}", searchBody()))
    scrollId = resp.path("_scroll_id").asText()
    page = resp.path("hits").path("hits")
    pos = 0
  }

  private def nextPage(): Unit = {
    val body = s"""{"scroll":"${p.scroll}","scroll_id":${mapper.writeValueAsString(scrollId)}}"""
    val resp = mapper.readTree(EsScrollSource.post(p.conn, "/_search/scroll", body))
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
      try EsScrollSource.delete(p.conn, "/_search/scroll",
        s"""{"scroll_id":[${mapper.writeValueAsString(scrollId)}]}""")
      catch { case _: Exception => () } // best-effort, contexts also expire by keep-alive
    }
}

/** One slice's PIT + `search_after` loop — the pagination ES documents as
  * the replacement for scroll on deep result sets: open a point-in-time
  * snapshot, page with `sort:[{_shard_doc:asc}]` chaining each page's last
  * `sort` value into the next request's `search_after`, close the PIT.
  * Unlike a scroll context the server keeps no per-page cursor — only the
  * snapshot — so a retried or resumed page is addressed by VALUE, not by
  * server state. Selected with option `pagination=search_after`; results
  * are multiset-identical to the scroll reader (q166 shares q163's
  * oracle). Termination: a page with fewer than `pageSize` hits is the
  * last (the documented search_after convention). */
private class EsPitReader(p: EsSlicePartition) extends PartitionReader[InternalRow] {
  private val mapper  = new ObjectMapper
  private val schema  = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
  private val fields  = schema.fields
  private var pitId: String    = _
  private var page: JsonNode   = _ // current hits array
  private var lastSort: JsonNode = _ // `sort` of the last hit seen
  private var pos              = 0
  private var emitted          = 0L
  private var row: InternalRow = _
  private var skipped          = 0L

  private def searchBody(): String = {
    val root = mapper.createObjectNode()
    if (p.sliceMax > 1) {
      val s = root.putObject("slice")
      s.put("id", p.sliceId); s.put("max", p.sliceMax)
    }
    root.put("size", p.pageSize)
    root.set[ObjectNode]("query", mapper.readTree(p.queryJson).asInstanceOf[ObjectNode])
    val pit = root.putObject("pit")
    pit.put("id", pitId); pit.put("keep_alive", p.scroll)
    val src = root.putArray("_source")
    fields.foreach(f => src.add(f.name))
    root.putArray("sort").addObject().put("_shard_doc", "asc")
    if (lastSort != null && lastSort.isArray && lastSort.size() > 0)
      root.set[JsonNode]("search_after", lastSort)
    root.toString
  }

  private def nextPage(): Unit = {
    if (pitId == null)
      pitId = mapper.readTree(
        EsScrollSource.post(p.conn, s"/${p.index}/_pit?keep_alive=${p.scroll}", "{}"))
        .path("id").asText()
    val resp = mapper.readTree(EsScrollSource.post(p.conn, "/_search", searchBody()))
    page = resp.path("hits").path("hits")
    pos = 0
    if (page.size() > 0) lastSort = page.get(page.size() - 1).path("sort")
  }

  override def next(): Boolean = {
    if (p.limit >= 0 && emitted >= p.limit) return false
    while (true) {
      if (page == null || pos >= page.size()) {
        // a short page was the last one (search_after termination)
        if (page != null && page.size() < p.pageSize) return false
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
    if (pitId != null) {
      try EsScrollSource.delete(p.conn, "/_pit",
        s"""{"id":${mapper.writeValueAsString(pitId)}}""")
      catch { case _: Exception => () } // best-effort, PITs also expire by keep-alive
    }
}

/** Streaming offset for the ES tail: the highest `cursorField` value
  * delivered so far (exclusive lower bound of the next epoch). Bare-number
  * JSON so the checkpoint offset log is human-auditable. */
private[es] case class EsCursor(last: Long) extends StreamOffset {
  override def json(): String = last.toString
}

/** Streaming tail of an ES index over the wire protocol — the modern
  * counterpart to the reference's SCHEDULED batch exports (its Bootstrap
  * re-runs the scroll export per time window; a Structured Streaming tail
  * subsumes that loop with exactly-once cursor arithmetic):
  *
  *   - The cursor is a monotonic numeric field (`cursorField`, default
  *     event_id — ingest-time sequence ids / auto-increment keys in
  *     practice). `latestOffset` asks the server for the field's current
  *     `max` (one `size:0` aggregation — no documents move) and advances
  *     at most `maxIdsPerBatch` cursor values per epoch (admission
  *     control, the scroll-page analog).
  *   - Epoch (start, end] compiles to a `range` clause ANDed onto the base
  *     query; each of the N slices drives an independent PIT +
  *     search_after read of that range — the same executor fan-out as the
  *     batch path, per epoch.
  *   - Index patterns resolve ONCE at stream construction (the same
  *     `_cat/indices` discovery as the batch path); the resolved set is
  *     searched multi-index per epoch. Indices created after the stream
  *     starts join on the next restart — the cursor lives in the
  *     checkpoint, so a restart is cheap and loses nothing.
  *   - The stream keeps NO state of its own: a fresh instance resumes from
  *     whatever committed offset Spark replays from the checkpoint — rows
  *     below the cursor are never re-read (no duplicates), the epoch range
  *     is half-open so none are skipped. Late writes BELOW the cursor are out
  *     of scope by design (the tail contract; same as any log tailer).
  *   - `Trigger.AvailableNow` snapshots the server max once and drains up
  *     to it in admission-sized epochs, then terminates.
  */
private class EsTailStream(
    conn: EsConn,
    index: String,
    slices: Int,
    pageSize: Int,
    scroll: String,
    required: StructType,
    queryJson: String,
    cursorField: String,
    maxIdsPerBatch: Long
) extends MicroBatchStream
    with SupportsTriggerAvailableNow {
  private val mapper = new ObjectMapper
  @volatile private var snapshotMax: Option[Long] = None // set by AvailableNow

  /** A wildcard pattern resolved to the concrete comma-joined index list —
    * without this, a literal `events-*` path would 400 (and per-epoch
    * cursor admission would be meaningless across unknown indices). */
  private val resolvedIndex: String = {
    val names = EsScrollSource.resolveIndices(conn, index)
    require(names.nonEmpty, s"es tail: index pattern '$index' matched no indices")
    names.mkString(",")
  }

  /** Current server-side max of the cursor field (−1 on an empty index):
    * one aggregation request, zero documents over the wire. */
  private def serverMax(): Long = {
    val body = s"""{"size":0,"query":$queryJson,"aggs":{"m":{"max":{"field":"$cursorField"}}}}"""
    val v = mapper.readTree(EsScrollSource.post(conn, s"/$resolvedIndex/_search", body))
      .path("aggregations").path("m").path("value")
    if (v.isNumber) v.asLong() else -1L
  }

  override def prepareForTriggerAvailableNow(): Unit = snapshotMax = Some(serverMax())

  override def initialOffset(): StreamOffset = EsCursor(-1L)

  override def deserializeOffset(json: String): StreamOffset = EsCursor(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxIdsPerBatch)

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val s   = start.asInstanceOf[EsCursor].last
    val cap = snapshotMax.getOrElse(serverMax())
    val step = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _               => maxIdsPerBatch
    }
    EsCursor(math.max(s, math.min(s + math.max(step, 1L), cap)))
  }

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException("latestOffset(start, limit) is the entry point")

  override def reportLatestOffset(): StreamOffset =
    EsCursor(snapshotMax.getOrElse(serverMax()))

  override def planInputPartitions(start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[EsCursor].last
    val e = end.asInstanceOf[EsCursor].last
    if (e <= s) return Array.empty
    // (s, e] as a range clause ANDed onto the base query
    val ranged =
      s"""{"bool":{"must":[$queryJson,{"range":{"$cursorField":{"gt":$s,"lte":$e}}}]}}"""
    val n = math.max(1, slices)
    (0 until n).map { i =>
      EsSlicePartition(i, n, conn, resolvedIndex, ranged, pageSize, scroll,
        required.json, -1, "search_after"): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new EsPitReader(p.asInstanceOf[EsSlicePartition])
    }

  // the cursor lives in Spark's checkpoint offset log, not here
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}
