package graft.sources

import graft.Tables
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Avro DATA-file round trip (q126) — the last file-format gap vs the
  * reference's at-rest world, which is Avro-shaped end to end: records are
  * decoded against an Avro schema and written through
  * `AvroParquetWriter<GenericRecord>` (EsParquetWriter.java:26-27, :56), with
  * the `.asvc` schema persisted beside the output (Bootstrap.java:182-194).
  * [[AvroAsvc]] already reproduces the schema artifact byte-exact; this
  * closes the DATA side with real Avro object-container files.
  *
  * No spark-avro module ships in this environment (only avro-core), so the
  * round trip is built directly on the Avro library — which keeps both
  * halves honestly distributed:
  *
  *   - WRITE: `foreachPartition` streams each partition through a
  *     `DataFileWriter[GenericRecord]` into one container file per partition
  *     (the reference's one-file-per-source-partition layout,
  *     EsParquetWriter.java:56). The schema embedded in every container is
  *     the `.asvc` render itself — `"type":"error"` quirk included; Avro's
  *     parser treats error-records as records everywhere it matters.
  *   - READ: Spark's `binaryFile` source lists and splits the directory
  *     across tasks; each task decodes its containers with a
  *     `DataFileReader` over a seekable in-memory input. Container files are
  *     whole-file units (sync markers notwithstanding, a <128 MB container
  *     is one split in practice), so file-granular parallelism is the right
  *     read shape.
  *
  * Like q125's blob fixture, the container directory lives on the
  * driver-local filesystem, so the declared query is local-mode-bound; on a
  * real cluster the same code runs unchanged against any shared filesystem
  * path. A production Avro SINK would additionally go through a DSv2 commit
  * protocol (see [[graft.sources.dsv2.AuditSink]] for the full
  * task-commit/abort implementation); this query's job is format coverage,
  * and its audit (re-read + per-value compare against the source) is exactly
  * the check a commit protocol automates.
  */
object AvroData {

  /** Container schema = the reference's `.asvc` artifact for this slice,
    * rendered by the byte-exact writer (union-nullable fields, error-record
    * quirk, kite provenance docs — AvroAsvc scaladoc). */
  val sliceAsvc: String = AvroAsvc.render(
    "events_slice",
    Seq(
      AvroAsvc.AsvcField("event_id", "long", "0"),
      AvroAsvc.AsvcField("event_type", "string", "\"signup\""),
      AvroAsvc.AsvcField("user_id", "long", "0"),
      AvroAsvc.AsvcField("ts_us", "long", "0"),
      AvroAsvc.AsvcField("value", "double", "0.0")
    )
  )

  /** Boxed field types: Avro union-nullable fields decode to null, and the
    * encoder must be able to represent that (primitive fields would NPE on
    * a null — the fixture has none, but the decoder shouldn't assume).
    * Public, not private: the encoder's generated SafeProjection constructs
    * instances from outside this object and cannot touch a private class
    * (codegen fails with "Private member cannot be accessed"). */
  final case class Slice(
      event_id: java.lang.Long,
      event_type: String,
      user_id: java.lang.Long,
      ts_us: java.lang.Long,
      value: java.lang.Double
  )

  private def slice(spark: SparkSession, sfDir: String): Dataset[Slice] = {
    import spark.implicits._
    Tables
      .events(spark, sfDir)
      .filter($"event_type" === "signup")
      .select($"event_id", $"event_type", $"user_id", unix_micros($"ts").as("ts_us"), $"value")
      .as[Slice]
  }

  // One written fixture per (JVM, sfDir): plan-only consumers construct q126
  // too (the corpus sweep walks every declared query), so the write job must
  // not repeat per construction. Dirs are removed at JVM exit — without the
  // hook every bench/verify/test JVM would strand a graft_avro_* dir in /tmp.
  private val writtenDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  sys.addShutdownHook {
    writtenDirs.values.forEach(ParquetSink.deleteRecursively)
  }

  /** Distributed decode of a directory of Avro object-container files:
    * Spark's `binaryFile` source lists + splits, each task runs
    * `DataFileReader` over its containers. Exposed separately from the
    * declared query so the decode semantics (null union branches, loud
    * failure on a corrupt container — the writer-side reader never skips
    * bad files silently) are testable in isolation (AvroDataSpec). */
  private[graft] def decodeContainers(spark: SparkSession, dir: String): Dataset[Slice] = {
    import spark.implicits._
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(dir)
      .select($"content")
      .as[Array[Byte]]
      .mapPartitions { blobs =>
        blobs.flatMap { bytes =>
          val rd = new DataFileReader[GenericRecord](
            new SeekableByteArrayInput(bytes),
            new GenericDatumReader[GenericRecord]()
          )
          // Avro strings decode as Utf8 — normalize through toString
          def str(x: AnyRef): String = if (x == null) null else x.toString
          // drain eagerly inside try/finally: a lazy iterator would leak the
          // reader's decoder buffers until GC (and would never close at all
          // if a downstream limit stops consuming mid-container)
          try {
            val out = scala.collection.mutable.ArrayBuffer.empty[Slice]
            while (rd.hasNext) {
              val g = rd.next()
              out += Slice(
                g.get("event_id").asInstanceOf[java.lang.Long],
                str(g.get("event_type")),
                g.get("user_id").asInstanceOf[java.lang.Long],
                g.get("ts_us").asInstanceOf[java.lang.Long],
                g.get("value").asInstanceOf[java.lang.Double]
              )
            }
            out
          } finally rd.close()
        }
      }
  }

  /** Declared query (q126): write the signup slice as Avro object-container
    * files (one per partition), read the directory back distributed, and
    * audit that every row and value survived — same audit shape as
    * [[ParquetSink.orcRoundTrip]], so the DuckDB oracle replays it as a
    * count over the relational source. */
  def avroRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val schemaJson = sliceAsvc
    val dir = writtenDirs.computeIfAbsent(
      sfDir,
      _ => {
        val d = ParquetSink.scratchDir(spark, "avro") + "_" +
          java.lang.Integer.toHexString(sfDir.hashCode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        // fixed fan-in: 8 container files regardless of SF keeps the fixture
        // listing stable; at real scale the partition count is the knob
        slice(spark, sfDir)
          .repartition(8, $"event_id")
          .foreachPartition { (rows: Iterator[Slice]) =>
            val schema = new Schema.Parser().parse(schemaJson)
            val pid    = org.apache.spark.TaskContext.getPartitionId()
            val file   = new java.io.File(d, f"part-$pid%05d.avro")
            val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
            w.create(schema, file)
            try rows.foreach { r =>
              val rec = new GenericData.Record(schema)
              rec.put("event_id", r.event_id)
              rec.put("event_type", r.event_type)
              rec.put("user_id", r.user_id)
              rec.put("ts_us", r.ts_us)
              rec.put("value", r.value)
              w.append(rec)
            } finally w.close()
          }
        d
      }
    )
    val o = decodeContainers(spark, dir)
      .toDF()
      .select(
        $"event_id",
        $"event_type".as("a_type"),
        $"user_id".as("a_user"),
        $"ts_us".as("a_ts"),
        $"value".as("a_val")
      )
    slice(spark, sfDir)
      .toDF()
      .join(o, "event_id")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(
          when(
            $"event_type" <=> $"a_type" && $"user_id" <=> $"a_user" &&
              $"ts_us" <=> $"a_ts" && $"value" <=> $"a_val",
            0L
          ).otherwise(1L)
        ).as("avro_mismatches")
      )
  }
}
