package graft

import graft.sources.JsonDecode
import org.apache.spark.sql.functions._

/** Tolerant-decode semantics on literal data (reference O10/O11 parity). */
class JsonDecodeSpec extends SparkSpec {

  test("decodeWithDeadLetter splits malformed and null JSON into the dead letter") {
    import spark.implicits._
    val df = Seq(
      """{"k": 1}""",
      """{"k": 2}""",
      """{"j": 9}""",          // missing field -> valid, k null (default injection)
      """{not valid json""",   // malformed -> dead letter
      null.asInstanceOf[String] // null -> dead letter
    ).toDF("js")
    val (good, bad) = JsonDecode.decodeWithDeadLetter(df, "js", "k BIGINT")
    assert(good.count() === 3)
    assert(bad.count() === 2)
    val ks = good.select($"_parsed".getField("k")).as[Option[Long]].collect().toSet
    assert(ks === Set(Some(1L), Some(2L), None), "missing field decodes to null, not dropped")
  }

  test("keysSubsetOf rejects extra fields, accepts subsets (strict reference mode)") {
    import spark.implicits._
    val df = Seq(
      ("a", """{"k": 1}"""),
      ("b", """{"k": 1, "extra": 2}"""),
      ("c", """{}""")
    ).toDF("id", "js")
    val kept = df.filter(JsonDecode.keysSubsetOf($"js", Seq("k"))).select($"id").as[String].collect().toSet
    assert(kept === Set("a", "c"))
  }

  test("out-of-order fields decode identically (from_json is order-free)") {
    import spark.implicits._
    val df = Seq("""{"a": 1, "b": "x"}""", """{"b": "x", "a": 1}""").toDF("js")
    val parsed = df.select(from_json($"js", lit("a BIGINT, b STRING")).as("p")).distinct()
    assert(parsed.count() === 1)
  }

  // ---- nested type matrix (reference ExtendedJsonDecoder.java:260-461) ----

  private val nestedDdl =
    "k BIGINT, meta STRUCT<src: STRING, depth: BIGINT>, tags ARRAY<STRING>, nstr STRING, attrs MAP<STRING, BIGINT>"

  test("nested struct / array / map decode end-to-end") {
    import spark.implicits._
    val df = Seq(
      """{"k":7,"meta":{"src":"s1","depth":3},"tags":["a","b","c"],"nstr":"x","attrs":{"a":1,"b":2}}"""
    ).toDF("js")
    val (good, bad) = JsonDecode.decodeWithDeadLetter(df, "js", nestedDdl)
    assert(bad.count() === 0)
    val r = good
      .select(
        $"_parsed.meta.src",
        $"_parsed.meta.depth",
        size($"_parsed.tags"),
        element_at($"_parsed.attrs", "b")
      )
      .head()
    assert((r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)) === (("s1", 3L, 3, 2L)))
  }

  test("missing nested subtree decodes to null struct (default injection)") {
    import spark.implicits._
    val df = Seq("""{"k":7,"tags":["a"],"nstr":"x","attrs":{"a":1}}""").toDF("js")
    val (good, bad) = JsonDecode.decodeWithDeadLetter(df, "js", nestedDdl)
    assert(bad.count() === 0)
    assert(good.select($"_parsed.meta").head().isNullAt(0))
  }

  test("wrong scalar type inside a nested struct dead-letters the record") {
    import spark.implicits._
    val df = Seq(
      """{"k":7,"meta":{"src":"s1","depth":"deep"},"tags":["a"],"nstr":"x","attrs":{"a":1}}"""
    ).toDF("js")
    val (good, bad) = JsonDecode.decodeWithDeadLetter(df, "js", nestedDdl)
    assert(good.count() === 0, "BIGINT field receiving a string must reject the record")
    assert(bad.count() === 1)
  }

  test("bytes decode as ISO-8859-1, one char per byte (reference readBytes)") {
    import spark.implicits._
    // chars 0x00, 0x41 ('A'), 0xFF — the full latin-1 byte range shape
    val s  = new String(Array[Char](0x00, 0x41, 0xff))
    val df = Seq(s).toDF("s")
    val bytes = df.select(JsonDecode.bytesIso88591($"s")).as[Array[Byte]].head()
    assert(bytes.toSeq === Seq(0x00.toByte, 0x41.toByte, 0xff.toByte))
  }

  test("fixed(n) enforces exact width, wrong length nulls for dead-lettering") {
    import spark.implicits._
    val df = Seq(("abc", "abcd")).toDF("ok", "bad")
    val r = df.select(JsonDecode.fixedIso88591($"ok", 3), JsonDecode.fixedIso88591($"bad", 3)).head()
    assert(!r.isNullAt(0) && r.getAs[Array[Byte]](0).length === 3)
    assert(r.isNullAt(1), "length 4 into fixed(3) must null")
  }

  test("enum gates on symbol membership (reference readEnum)") {
    import spark.implicits._
    val df = Seq(("click", "bogus")).toDF("ok", "bad")
    val r = df.select(
      JsonDecode.enumSymbol($"ok", Seq("click", "view")),
      JsonDecode.enumSymbol($"bad", Seq("click", "view"))
    ).head()
    assert(r.getString(0) === "click")
    assert(r.isNullAt(1))
  }

  test("number arriving where STRING is declared coerces to its literal text") {
    import spark.implicits._
    val df = Seq("""{"k":7,"meta":{"src":"s","depth":1},"tags":[],"nstr":42,"attrs":{}}""").toDF("js")
    val (good, bad) = JsonDecode.decodeWithDeadLetter(df, "js", nestedDdl)
    assert(bad.count() === 0)
    assert(good.select($"_parsed.nstr").as[String].head() === "42")
  }

  // ---- general union resolution (reference readIndex :436-461) ----

  private def resolve(rec: String, branches: Seq[String]): Option[String] = {
    import spark.implicits._
    Seq(rec).toDF("rec")
      .select(JsonDecode.unionLabel(col("rec"), "u", branches).as("b"))
      .as[Option[String]]
      .head()
  }

  test("union: JSON null resolves to the null branch only when the union has one") {
    assert(resolve("""{"u":null}""", Seq("null", "long", "string")) === Some("null"))
    assert(resolve("""{"u":null}""", Seq("long", "string")) === None, "no null branch -> reject")
    // absent field: the reference's default injection nulls it before the
    // union resolves, so absent behaves as JSON null
    assert(resolve("""{}""", Seq("null", "long")) === Some("null"))
  }

  test("union: wrapped single-key object picks that branch; unknown label rejects") {
    assert(resolve("""{"u":{"long":3}}""", Seq("null", "long", "string")) === Some("long"))
    assert(resolve("""{"u":{"string":"x"}}""", Seq("null", "long", "string")) === Some("string"))
    assert(resolve("""{"u":{"double":1.5}}""", Seq("null", "long", "string")) === None)
    assert(resolve("""{"u":{"long":1,"string":"x"}}""", Seq("null", "long", "string")) === None,
      "multi-key object is not a valid wrapped union")
  }

  test("union: wrapped null label follows reference findLabel + readNull semantics") {
    // readIndex resolves {"null": ...} via findLabel over ALL branches
    // (:455); readNull then throws unless the payload token is JSON null —
    // so {"null": null} IS the null branch, {"null": 5} is a dead record
    assert(resolve("""{"u":{"null":null}}""", Seq("null", "long")) === Some("null"))
    assert(resolve("""{"u":{"null":null}}""", Seq("null", "long", "string")) === Some("null"))
    assert(resolve("""{"u":{"null":5}}""", Seq("null", "long")) === None,
      "non-null payload under the null label is a decode error (readNull throws)")
    assert(resolve("""{"u":{"null":null}}""", Seq("long", "string")) === None,
      "no null branch -> findLabel misses -> reject")
  }

  test("union: bare value is legal only for the two-branch nullable shortcut") {
    assert(resolve("""{"u":7}""", Seq("null", "long")) === Some("long"))
    assert(resolve("""{"u":"abc"}""", Seq("null", "string")) === Some("string"))
    assert(resolve("""{"u":7}""", Seq("null", "long", "string")) === None,
      "bare value with a 3-branch union rejects")
    assert(resolve("""{"u":7}""", Seq("long", "string")) === None,
      "bare value without a null branch rejects")
  }

  test("union: array and record branches follow the same generic label rules") {
    // labels are generic — the probes must work for non-scalar branches:
    // a bare ARRAY rides the two-branch shortcut (reference: START_ARRAY
    // falls to the null-union rule, :448-451), but a bare OBJECT can't —
    // START_OBJECT always enters the wrapped path (:444-447), so its first
    // key is taken as a label and an unknown key rejects. Records in
    // unions must therefore be WRAPPED; this pins that asymmetry.
    assert(resolve("""{"u":{"array":[1,2]}}""", Seq("null", "array")) === Some("array"))
    assert(resolve("""{"u":[1,2]}""", Seq("null", "array")) === Some("array"),
      "bare array takes the two-branch nullable shortcut")
    assert(resolve("""{"u":{"rec":{"f":1}}}""", Seq("null", "rec")) === Some("rec"))
    assert(resolve("""{"u":{"f":1}}""", Seq("null", "rec")) === None,
      "bare object enters the wrapped path: key 'f' is an unknown label")
  }

  test("union: wrapped and bare values extract through unionValue") {
    import spark.implicits._
    val wrapped = Seq("""{"u":{"long":3}}""").toDF("rec")
      .select(JsonDecode.unionValue(col("rec"), "u", "long").cast("long").as("v"))
      .as[Long].head()
    val bare = Seq("""{"u":7}""").toDF("rec")
      .select(JsonDecode.unionValue(col("rec"), "u", "long").cast("long").as("v"))
      .as[Long].head()
    assert(wrapped === 3L && bare === 7L)
  }

  test("union resolution matches the readIndex reference model on generated value/shape combos") {
    import spark.implicits._
    // executable model of ExtendedJsonDecoder.readIndex (:436-461), over
    // value shapes where the declarative probes are exact (no
    // string-that-parses-as-object ambiguity — that divergence is
    // documented on unionLabel)
    sealed trait V { def json: String }
    case object VNull                        extends V { def json = "null" }
    case class VLong(n: Long)                extends V { def json = n.toString }
    case class VStr(s: String)               extends V { def json = "\"" + s + "\"" }
    case class VWrapped(label: String, n: Long) extends V { def json = s"""{"$label":$n}""" }
    case object VWrappedNull                 extends V { def json = """{"null":null}""" }
    case class VMulti(n: Long)               extends V { def json = s"""{"long":$n,"string":"x"}""" }
    def model(v: V, branches: Seq[String]): Option[String] = v match {
      case VNull => if (branches.contains("null")) Some("null") else None
      case VWrappedNull => if (branches.contains("null")) Some("null") else None
      case VWrapped("null", _) => None // findLabel hits, readNull throws on the payload
      case VWrapped(label, _) =>
        if (branches.filter(_ != "null").contains(label)) Some(label) else None
      case VMulti(_) => None
      case _ => // bare value: only the two-branch nullable shortcut accepts
        if (branches.size == 2 && branches.contains("null"))
          Some(branches.filter(_ != "null").head)
        else None
    }
    val branchSets = Seq(
      Seq("null", "long"),
      Seq("null", "string"),
      Seq("null", "long", "string"),
      Seq("long", "string")
    )
    val values: Seq[V] = Seq(
      VNull, VLong(7), VLong(-3), VStr("abc"), VStr("zq9"),
      VWrapped("long", 5), VWrapped("string", 1), VWrapped("double", 2),
      VWrapped("unknown", 9), VWrapped("null", 5), VWrappedNull, VMulti(4)
    )
    for (branches <- branchSets; v <- values) {
      val got = Seq(s"""{"u":${v.json}}""").toDF("rec")
        .select(JsonDecode.unionLabel(col("rec"), "u", branches).as("b"))
        .as[Option[String]]
        .head()
      assert(got === model(v, branches),
        s"value ${v.json} with union [${branches.mkString(",")}]: got $got, model says ${model(v, branches)}")
    }
  }

  test("union: a wrapped payload that is JSON null yields a null VALUE, never the wrapper text") {
    import spark.implicits._
    // {"u":{"string":null}} resolves the string branch (single known key)
    // but its payload fails to decode — the reference throws; here the
    // value must be null (callers map that to dead), NOT the raw wrapper
    val v = Seq("""{"u":{"string":null}}""").toDF("rec")
      .select(JsonDecode.unionValue(col("rec"), "u", "string").as("v"))
      .as[Option[String]].head()
    assert(v === None, s"wrapped null payload must extract as null, got $v")
  }
}
