package graft

import graft.sources.es.{EsScrollSource, EsStubServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The REAL wire-protocol ES scroll connector (EsScrollSource) read against
  * the in-JVM stub cluster (EsStubServer): end-to-end row fidelity, sliced
  * fan-out, filter/column/limit pushdown visible both in the plan AND in
  * what actually crossed the wire, scroll-context hygiene, tolerant decode,
  * and sampled schema inference. */
class EsScrollSourceSpec extends SparkSpec {

  private lazy val events: DataFrame = Tables.events(spark, sf).cache()

  private def withServer[A](df: DataFrame, malformedEvery: Int = 0)(
      f: (EsStubServer, String) => A): A = {
    val srv = EsStubServer.fromDataFrame(df, "events", malformedEvery)
    srv.start()
    try f(srv, srv.url)
    finally srv.stop()
  }

  private def esRead(url: String, slices: Int = 4, pageSize: Int = 100): DataFrame =
    spark.read
      .format("graft.sources.es.EsScrollSource")
      .schema(events.schema)
      .option("url", url)
      .option("index", "events")
      .option("slices", slices)
      .option("pageSize", pageSize)
      .load()

  test("full scroll read returns every seeded row exactly once, across slices and pages") {
    withServer(events) { (srv, url) =>
      val got = esRead(url, slices = 4, pageSize = 57) // force multi-page scrolls per slice
      assert(got.count() === events.count())
      // one action so far → one initial search per slice, then page loops
      assert(srv.searchCalls.get() === 4, "one initial search per slice")
      assert(srv.scrollCalls.get() > 0, "pagination must go through _search/scroll")
      // exact multiset equality with the parquet source of truth
      assert(got.exceptAll(events).count() === 0)
      assert(events.exceptAll(got).count() === 0)
    }
  }

  test("equality filter is pushed as match_phrase and non-matching docs never cross the wire") {
    import spark.implicits._
    withServer(events) { (srv, url) =>
      val purchases = esRead(url, slices = 2).where($"event_type" === "purchase")
      val plan      = purchases.queryExecution.executedPlan.toString
      assert(plan.contains("PushedEsQuery") && plan.contains("match_phrase"),
        s"pushed query DSL must be visible in the scan:\n$plan")
      val n = purchases.count()
      assert(n === events.where($"event_type" === "purchase").count())
      assert(srv.hitsServed.get() === n,
        s"server must serialize only matching docs (served ${srv.hitsServed.get()}, matched $n)")
      assert(srv.lastSearchBody.contains("match_phrase"))
    }
  }

  test("range filter on a timestamp column compiles to an ES range query") {
    import spark.implicits._
    val cut = events.agg(max($"ts")).head.getTimestamp(0)
    withServer(events) { (srv, url) =>
      val recent = esRead(url, slices = 2).where($"ts" >= lit(cut))
      assert(recent.count() === events.where($"ts" >= lit(cut)).count())
      assert(srv.lastSearchBody.contains("\"range\"") && srv.lastSearchBody.contains("gte"),
        s"expected a range/gte clause in: ${srv.lastSearchBody}")
    }
  }

  test("column pruning becomes a _source filter: unneeded fields are not shipped") {
    import spark.implicits._
    withServer(events) { (srv, url) =>
      val types = esRead(url, slices = 2).select($"event_type")
      assert(types.distinct().count() === events.select($"event_type").distinct().count())
      val src = srv.lastSearchBody
      assert(src.contains("\"_source\":[\"event_type\"]"),
        s"pruned read must request only event_type in _source: $src")
    }
  }

  test("limit pushdown caps what each slice pulls") {
    withServer(events) { (srv, url) =>
      val five = esRead(url, slices = 4, pageSize = 1000).limit(5)
      assert(five.count() === 5)
      // 4 slices × ≤5 rows each is the pushed superset; far below the full index
      assert(srv.hitsServed.get() <= 20,
        s"pushed limit must stop the scroll early (served ${srv.hitsServed.get()})")
    }
  }

  test("every scroll context is cleared after the read (DELETE /_search/scroll)") {
    withServer(events) { (srv, url) =>
      esRead(url, slices = 3, pageSize = 97).count()
      assert(srv.liveContexts === 0, "readers must clear their scroll contexts on close")
      assert(srv.clearedScrolls.get() === 3)
    }
  }

  test("a hit whose _source is not an object is skipped, not fatal (reference per-record catch)") {
    withServer(events.limit(100), malformedEvery = 10) { (_, url) =>
      // every 10th hit malformed → 10 of 100 dropped, rest decode fine
      assert(esRead(url, slices = 1, pageSize = 1000).count() === 90)
    }
  }

  test("missing fields decode as null (tolerant decode, not failure)") {
    import spark.implicits._
    withServer(events.drop("props").limit(50)) { (_, url) =>
      // reader schema still declares props; server never serves it
      val got = esRead(url, slices = 1)
      assert(got.count() === 50)
      assert(got.where($"props".isNull).count() === 50)
      assert(got.where($"event_id".isNotNull).count() === 50)
    }
  }

  test("schema inference samples a page and infers via the O6 pipeline") {
    withServer(events.select("event_id", "event_type", "value").limit(200)) { (_, url) =>
      val inferred = spark.read
        .format("graft.sources.es.EsScrollSource")
        .option("url", url)
        .option("index", "events")
        .option("inferSample", 50)
        .load()
      val names = inferred.schema.fieldNames.toSet
      assert(names === Set("event_id", "event_type", "value"))
      assert(inferred.schema.fields.forall(_.nullable), "inferred fields promote to nullable")
      assert(inferred.schema("event_id").dataType === LongType)
      assert(inferred.schema("event_type").dataType === StringType)
      assert(inferred.count() === 200)
    }
  }
}
