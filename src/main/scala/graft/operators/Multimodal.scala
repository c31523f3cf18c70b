package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pack: image/audio/video as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic STUB (the "pixels" are md5 bytes of the document text); the
  * Spark-side plumbing is real and is what's being exercised: binary column
  * construction, metadata struct schema, typed `mapPartitions` batch
  * iteration (the Scala analog of `mapInPandas` — per-partition imperative
  * decode, exactly the shape a libjpeg/ffmpeg call-out would use), and
  * partition-parallel frame sampling. Because the fake payload is md5-derived
  * the DuckDB oracle can verify the features byte-for-byte.
  */
object Multimodal {

  /** One "image" row: opaque payload + typed metadata. */
  final case class ImageRow(doc_id: Long, img: Array[Byte], width: Int, height: Int, channels: Int)

  /** Extracted features (the stub decoder's output). */
  final case class ImageFeatures(
      doc_id: Long,
      n_bytes: Int,
      first_byte: Int,
      last_byte: Int,
      byte_sum: Int,
      mean_byte: Double,
      n_pixels: Int
  )

  final case class VideoRow(doc_id: Long, video: Array[Byte], n_frames: Int, frame_bytes: Int)

  final case class FrameFeature(doc_id: Long, frame_idx: Int, first_byte: Int, byte_sum: Int)

  /** The multimodal table: binary payload (16 md5 bytes standing in for an
    * encoded image) + metadata derived deterministically from doc_id. */
  def imageTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .spread(Tables.documents(spark, sfDir))
      .select(
        $"doc_id",
        unhex(md5($"text")).as("img"),
        ($"doc_id" % 64 + 1).cast("int").as("width"),
        ($"doc_id" % 32 + 1).cast("int").as("height"),
        lit(3).as("channels")
      )
  }

  /** Decode + feature-extract via typed mapPartitions (stub decoder over the
    * binary payload; real batch-iteration plumbing). Embarrassingly parallel
    * — no shuffle before the presentation sort. */
  def imageFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    imageTable(spark, sfDir)
      .as[ImageRow]
      .mapPartitions { rows =>
        rows.map { r =>
          // STUB decode: a real implementation would decode r.img with an
          // image codec here; the fake features are deterministic byte math.
          val u = r.img.map(_ & 0xff)
          ImageFeatures(
            doc_id = r.doc_id,
            n_bytes = r.img.length,
            first_byte = u.head,
            last_byte = u.last,
            byte_sum = u.sum,
            mean_byte = u.sum.toDouble / u.length,
            n_pixels = r.width * r.height * r.channels
          )
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  final case class AudioRow(doc_id: Long, pcm: Array[Byte], sample_rate: Int, n_windows: Int, window_bytes: Int)

  final case class AudioFeature(
      doc_id: Long,
      window_idx: Int,
      energy: Long,
      peak: Int,
      is_silence: Boolean
  )

  /** "Audio" = 3 concatenated 16-byte PCM windows (md5(text || '#' || w));
    * per-window energy / peak / silence-gate features via the same typed
    * mapPartitions batch plumbing — the windowed DSP call-out shape of an
    * audio pipeline with the codec stubbed. Samples are unsigned bytes;
    * energy = Σ(s−128)², the silence gate fires below a fixed threshold. */
  def audioFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val windows = (0 until 3).map(w => unhex(md5(concat($"text", lit(s"#$w")))))
    Tables
      .spread(Tables.documents(spark, sfDir))
      .select(
        $"doc_id",
        concat(windows: _*).as("pcm"),
        lit(16000).as("sample_rate"),
        lit(3).as("n_windows"),
        lit(16).as("window_bytes")
      )
      .as[AudioRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          (0 until r.n_windows).iterator.map { w =>
            val win = r.pcm.slice(w * r.window_bytes, (w + 1) * r.window_bytes).map(_ & 0xff)
            val energy = win.map(s => { val d = (s - 128).toLong; d * d }).sum
            AudioFeature(r.doc_id, w, energy, win.max, energy < 20000L)
          }
        }
      }
      .toDF()
      .orderBy($"doc_id", $"window_idx")
  }

  /** Declared query (q125): blob-store ingest through Spark's `binaryFile`
    * datasource — the missing FRONT of the multimodal pipeline (the other
    * operators start from binary COLUMNS; real corpora start from files in
    * an object store). A deterministic slice of `events` is materialized as
    * one small blob file per row (fixture PREP, driver-side, bounded at 97
    * files — the operator under test is the SCAN), then read back with
    * `format("binaryFile")`: Spark lists the directory distributed, splits
    * the listing across tasks by size, and yields (path, length, content)
    * rows without any decode — exactly how image/audio corpora enter a
    * cluster. Features are computed relationally on the binary column
    * (length, md5) so the DuckDB oracle can replay them from the source
    * rows without ever seeing a file. */
  // One blob fixture per (JVM, sfDir): q125 is constructed by plan-only
  // consumers too (the corpus sweep walks every declared query), so the
  // prep job and temp dir must not repeat per invocation. The fixture (and
  // therefore the declared query) is local-mode-bound — executors read the
  // driver's temp dir; on a real cluster the blobs would live on a shared
  // store and only the `spark.read.format("binaryFile")` half applies.
  private val blobDirs = new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()
  // delete at JVM exit — without this every bench/verify/test JVM strands a
  // graft_blobs* dir in /tmp
  sys.addShutdownHook {
    blobDirs.values.forEach(d => graft.sources.ParquetSink.deleteRecursively(d.toString))
  }

  def binaryIngest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = blobDirs.computeIfAbsent(
      sfDir,
      _ => {
        val d = java.nio.file.Files.createTempDirectory("graft_blobs")
        // blob content is pure text ("<event_type>|<event_id>") so both
        // engines can recompute md5/length from the relational source
        val rows = Tables
          .events(spark, sfDir)
          .filter($"event_id" % 613 === 0)
          .select(
            $"event_id",
            concat($"event_type", lit("|"), $"event_id".cast("string")).as("payload")
          )
          .orderBy($"event_id")
          .as[(Long, String)]
          .head(97) // bounded fixture prep (97 rows max), not a data collect
        rows.foreach { case (id, payload) =>
          java.nio.file.Files.write(d.resolve(f"blob_$id%012d.bin"), payload.getBytes("UTF-8"))
        }
        d
      }
    )
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir.toString)
      .select(
        // parse the id from the source's own `path` column (part of the
        // binaryFile schema) — input_file_name() is execution-context-
        // dependent and documented to go empty off the V1 file path
        regexp_extract($"path", "blob_(\\d+)\\.bin", 1).cast("long").as("event_id"),
        $"length".cast("long").as("n_bytes"),
        md5($"content").as("content_md5")
      )
      .orderBy($"event_id")
  }

  /** "Video" = 4 concatenated 16-byte frames (md5(text || ':' || f)); sample
    * every 2nd frame and extract per-frame features — the frame-sampling
    * plumbing of a video pipeline with the codec stubbed out. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val frames = (0 until 4).map(f => unhex(md5(concat($"text", lit(s":$f")))))
    Tables
      .spread(Tables.documents(spark, sfDir))
      .select($"doc_id", concat(frames: _*).as("video"), lit(4).as("n_frames"), lit(16).as("frame_bytes"))
      .as[VideoRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          // STUB decode: sample frames 0 and 2 (every 2nd), slice the payload
          (0 until r.n_frames by 2).iterator.map { f =>
            val frame = r.video.slice(f * r.frame_bytes, (f + 1) * r.frame_bytes).map(_ & 0xff)
            FrameFeature(r.doc_id, f, frame.head, frame.sum)
          }
        }
      }
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }
}
