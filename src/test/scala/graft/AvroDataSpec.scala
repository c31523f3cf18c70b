package graft

import graft.sources.AvroData
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** Unit coverage for the Avro container decode half of q126, beyond what
  * the oracle sees: the declared query's fixture has no null fields and
  * no corrupt files, so those semantics need direct tests — null union
  * branches must survive the round trip, and a corrupt container must
  * fail the job loudly (an ingest that silently skips a bad file would
  * pass every count-based audit while losing data). */
class AvroDataSpec extends SparkSpec {

  private def writeContainer(dir: java.nio.file.Path, name: String)(
      rows: Seq[(java.lang.Long, String, java.lang.Long, java.lang.Long, java.lang.Double)]
  ): Unit = {
    val schema = new Schema.Parser().parse(AvroData.sliceAsvc)
    val w      = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, dir.resolve(name).toFile)
    try rows.foreach { case (id, tpe, user, ts, v) =>
      val rec = new GenericData.Record(schema)
      rec.put("event_id", id)
      rec.put("event_type", tpe)
      rec.put("user_id", user)
      rec.put("ts_us", ts)
      rec.put("value", v)
      w.append(rec)
    } finally w.close()
  }

  test("the .asvc-rendered schema parses and null union branches survive the round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_spec")
    try {
      writeContainer(dir, "part-00000.avro")(
        Seq(
          (1L, "signup", 10L, 1000L, 1.5),
          (2L, null, null, null, null), // every nullable branch exercised
          (3L, "click", 30L, 3000L, -0.25)
        )
      )
      val got = AvroData
        .decodeContainers(spark, dir.toString)
        .collect()
        .sortBy(s => Option(s.event_id).map(_.toLong).getOrElse(Long.MinValue))
      assert(got.length === 3)
      assert(got(0).event_type === "signup" && got(0).value === 1.5)
      assert(got(1).event_type === null && got(1).user_id === null)
      assert(got(1).ts_us === null && got(1).value === null)
      assert(got(2).event_type === "click" && got(2).user_id === 30L)
    } finally {
      val walk = java.nio.file.Files.walk(dir)
      try
        walk
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("a corrupt container fails the read loudly (no silent skip)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_spec_bad")
    try {
      writeContainer(dir, "part-00000.avro")(Seq((1L, "signup", 10L, 1000L, 1.5)))
      // not an Avro container: wrong magic — DataFileReader must throw,
      // surfacing as a failed Spark job, never an empty/partial result
      java.nio.file.Files.write(
        dir.resolve("part-00001.avro"),
        "this is not an avro container".getBytes("UTF-8")
      )
      val e = intercept[Exception] {
        AvroData.decodeContainers(spark, dir.toString).collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(
        chain(e).exists(c => c.getMessage != null && c.getMessage.toLowerCase.contains("not a")
          || c.isInstanceOf[java.io.IOException]),
        s"expected an Avro container IOException in the cause chain, got: $e"
      )
    } finally {
      val walk = java.nio.file.Files.walk(dir)
      try
        walk
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
