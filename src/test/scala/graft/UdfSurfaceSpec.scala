package graft

import org.apache.spark.sql.functions._

/** Scalar UDF surface (SURVEY.md §2.2 UDF row). The engine deliberately
  * uses built-ins/kernels in every declared query (codegen beats UDF
  * boxing), but the registration surface must work for users. */
class UdfSurfaceSpec extends SparkSpec {

  test("Scala UDF registers and evaluates through both DSL and SQL") {
    import spark.implicits._
    val tokenDensity = udf((text: String, nChars: Long) =>
      if (nChars == 0) 0.0 else text.split(" ").length.toDouble / nChars
    )
    spark.udf.register("token_density", tokenDensity)

    val viaDsl = Tables.documents(spark, sf).limit(20)
      .select($"doc_id", tokenDensity($"text", $"n_chars").as("d"))
    Tables.documents(spark, sf).limit(20).createOrReplaceTempView("docs_udf")
    val viaSql = spark.sql("SELECT doc_id, token_density(text, n_chars) AS d FROM docs_udf")

    assert(viaDsl.exceptAll(viaSql).count() === 0)
    assert(viaDsl.filter($"d" <= 0).count() === 0)
  }

  test("typed Dataset map with case-class Encoder (the typed surface)") {
    import spark.implicits._
    val lens = Tables.documents(spark, sf).limit(10)
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) => (id, text.length) }
      .collect()
      .toMap
    val expected = Tables.documents(spark, sf).limit(10)
      .select($"doc_id", length($"text")).as[(Long, Int)].collect().toMap
    assert(lens === expected)
  }
}
