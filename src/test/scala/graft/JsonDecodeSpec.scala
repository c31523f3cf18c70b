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
}
