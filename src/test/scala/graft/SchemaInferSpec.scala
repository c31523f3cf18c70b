package graft

import graft.sources.SchemaInfer
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Schema pipeline tests, including the golden test against the reference's
  * committed inferred schema (office365_signin/schema.asvc — each field's
  * doc string embeds the original sample value, a ready-made inference
  * fixture; SURVEY.md §5.4). */
class SchemaInferSpec extends SparkSpec {

  private val asvcPath = "/root/reference/office365_signin/schema.asvc"

  test("golden: inference from the reference schema's own samples recovers its field set") {
    val mapper = new ObjectMapper()
    val root   = mapper.readTree(new java.io.File(asvcPath))
    val fields = root.get("fields").elements().asScala.toSeq
    val sample = mapper.createObjectNode()
    val names  = fields.map { f =>
      val name = f.get("name").asText()
      val doc  = f.get("doc").asText() // "Type inferred from '<json>'"
      val raw  = doc.stripPrefix("Type inferred from '").stripSuffix("'")
      sample.set[com.fasterxml.jackson.databind.node.ObjectNode](name, mapper.readTree(raw))
      name
    }
    import spark.implicits._
    val st = SchemaInfer.allNullable(
      SchemaInfer.infer(spark, Seq(mapper.writeValueAsString(sample)).toDS())
    )
    assert(st.fieldNames.toSet === names.toSet, "field set must match the reference schema")
    assert(st.fields.forall(_.nullable), "all fields nullable (enableDefaultValue parity)")
    // type compatibility: reference int/long -> spark integral; string -> string
    val refTypes = fields.map { f =>
      f.get("name").asText() -> f.get("type").elements().asScala.map(_.asText()).toSeq.filterNot(_ == "null").head
    }.toMap
    refTypes.foreach { case (n, rt) =>
      val dt = st(n).dataType
      rt match {
        case "string"        => assert(dt === StringType, s"$n")
        case "int" | "long"  => assert(dt === LongType || dt === IntegerType, s"$n")
        case "float" | "double" => assert(dt === DoubleType, s"$n")
        case _               => // nested/other: presence is enough for the golden check
      }
    }
  }

  test("golden BYTES: asvc writer regenerates the reference schema.asvc exactly") {
    // The doc strings embed each field's original sample value; rebuild the
    // sample document from them, run the writer, byte-diff against the
    // committed artifact — "type":"error" quirk, unions, docs, escaping,
    // single-line layout, no trailing newline, all of it.
    val mapper = new ObjectMapper()
    val root   = mapper.readTree(new java.io.File(asvcPath))
    val ruleName = root.get("name").asText()
    val fields   = root.get("fields").elements().asScala.toSeq
    val sampleJson = fields
      .map { f =>
        val name = f.get("name").asText()
        val doc  = f.get("doc").asText()
        val raw  = doc.stripPrefix("Type inferred from '").stripSuffix("'")
        s"${mapper.writeValueAsString(name)}:$raw"
      }
      .mkString("{", ",", "}")
    val regenerated = graft.sources.AvroAsvc.fromSampleJson(ruleName, sampleJson)
    val original    = java.nio.file.Files.readString(java.nio.file.Paths.get(asvcPath))
    assert(regenerated === original, "asvc byte stream must match the reference artifact")
  }

  test("asvc writer sanitizes rule names and persists without trailing newline") {
    val out = java.nio.file.Files.createTempDirectory("graft_asvc").resolve("schema.asvc")
    graft.sources.AvroAsvc.persist("my-rule-x", """{"k":1,"s":"v"}""", out.toString)
    val bytes = java.nio.file.Files.readAllBytes(out)
    val text  = new String(bytes, "UTF-8")
    assert(text.startsWith("""{"type":"error","name":"my_rule_x","""), text)
    assert(text.contains(""""type":["null","int"]"""), text)
    assert(!text.endsWith("\n"))
  }

  test("widenMaxFields keeps the widest candidate (reference width-max semantics)") {
    val narrow = StructType(Seq(StructField("a", LongType)))
    val wide   = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    assert(SchemaInfer.widenMaxFields(Seq(narrow, wide)) === wide)
    assert(SchemaInfer.widenMaxFields(Seq(wide, narrow)) === wide)
  }

  test("widenUnion unions field sets, first type wins on collision") {
    val s1 = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val s2 = StructType(Seq(StructField("b", LongType), StructField("c", DoubleType)))
    val u  = SchemaInfer.widenUnion(Seq(s1, s2))
    assert(u.fieldNames.toSeq === Seq("a", "b", "c"))
    assert(u("b").dataType === StringType)
  }

  test("widenUnion is monotone: adding a candidate never loses fields") {
    val s1 = StructType(Seq(StructField("a", LongType)))
    val s2 = StructType(Seq(StructField("b", StringType)))
    val s3 = StructType(Seq(StructField("c", DoubleType)))
    val u12  = SchemaInfer.widenUnion(Seq(s1, s2))
    val u123 = SchemaInfer.widenUnion(Seq(s1, s2, s3))
    assert(u12.fieldNames.toSet.subsetOf(u123.fieldNames.toSet))
  }

  test("allNullable promotes recursively through structs and arrays") {
    val nested = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("s", StructType(Seq(StructField("y", StringType, nullable = false))), nullable = false),
      StructField("arr", ArrayType(StructType(Seq(StructField("z", LongType, nullable = false))), containsNull = false), nullable = false)
    ))
    val n = SchemaInfer.allNullable(nested)
    assert(n.fields.forall(_.nullable))
    assert(n("s").dataType.asInstanceOf[StructType].fields.forall(_.nullable))
    val at = n("arr").dataType.asInstanceOf[ArrayType]
    assert(at.containsNull)
    assert(at.elementType.asInstanceOf[StructType].fields.forall(_.nullable))
  }

  test("persist writes schema JSON readable back to the same StructType") {
    val st   = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val path = java.nio.file.Files.createTempDirectory("graft_schema").resolve("schema.json")
    SchemaInfer.persist(SchemaInfer.allNullable(st), path.toString)
    val back = DataType.fromJson(java.nio.file.Files.readString(path)).asInstanceOf[StructType]
    assert(back.fieldNames.toSeq === Seq("a", "b"))
  }
}
