package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical file-layout operators — the write-side half of scan pruning.
  *
  * Parquet row-group skipping only works when the values a predicate
  * touches are CLUSTERED: min/max footer stats on a randomly-ordered file
  * span the whole domain and prune nothing. Sorting the write by a
  * Z-order (Morton) curve interleaves the bits of two columns so that
  * range predicates on EITHER column land in a small number of row
  * groups — the standard multi-dimensional clustering technique for
  * 100 TB tables (one extra range-partitioned sort at write time, no read
  * cost ever). The curve math is integer-exact, so the DuckDB oracle
  * replays it bit-for-bit; the actual pruning win is asserted in
  * ScaleTechniquesSpec by comparing per-file key spans of a z-ordered vs
  * naturally-ordered write of the same rows.
  */
object Layout {

  /** Bits per dimension for the Morton curve (10 bits → domains of 1024).
    * The curve assumes BOTH dimensions use their full bit width — skewed
    * domains (one column spanning 4 bits, the other 9) leave the high
    * interleaved bits dominated by one column and degrade clustering, so
    * production z-ordering (cf. Delta OPTIMIZE ZORDER BY) first normalizes
    * each dimension to rank/min-max space; the pruning test does exactly
    * that scaling before the write. */
  private val Bits = 10

  /** Morton/Z-value: interleave the low `Bits` bits of x (even positions)
    * and y (odd positions). Disjoint bit positions, so the sum IS the
    * bitwise-or. DuckDB mirror:
    * `list_sum(list_transform(range(0, 10), i -> ((x >> i) & 1) * 2**(2*i) + ((y >> i) & 1) * 2**(2*i+1)))`. */
  def zValue(x: Column, y: Column): Column =
    (0 until Bits)
      .map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }
      .reduce(_ + _)

  /** Declared query: the Z-order curve over (user_id, value-bucket) for the
    * events table — per-curve-segment audit of how many rows and how narrow
    * a user_id span each 4096-cell z-range holds (narrow per-segment spans
    * are exactly what makes the layout prunable). */
  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, sfDir)
      .select(
        $"event_id",
        $"user_id".cast("long").as("xb"),
        (floor($"value").cast("long") % 1024L).as("yb")
      )
      .withColumn("zval", zValue($"xb", $"yb"))
      // 2^12-cell segments via bit shift — exact integer semantics in both
      // engines (long `/` would be double division in Spark and a rounding
      // cast in DuckDB)
      .groupBy(shiftright($"zval", 12).as("z_segment"))
      .agg(
        count(lit(1)).as("n_rows"),
        min($"xb").as("min_user"),
        max($"xb").as("max_user"),
        min($"zval").as("min_z"),
        max($"zval").as("max_z")
      )
      .orderBy($"z_segment")
  }

  /** Write `df` clustered by the z-value of (xCol, yCol): range partition on
    * the curve, sort within partitions, one parquet file per range — the
    * layout the pruning test reads back. */
  private[graft] def writeZOrdered(df: DataFrame, xCol: String, yCol: String, out: String, nFiles: Int): Unit = {
    val z = df.withColumn("__z", zValue(col(xCol), col(yCol)))
    z.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(out)
  }

  /** Declared query (q134): data-skipping audit over REAL files — the
    * pruning claim in this file's header measured end-to-end instead of
    * asserted abstractly. The events table is written once (memoized) as
    * one parquet file per OCCUPIED Morton tile (`zval >> 14` = aligned
    * 128×128 tiles of the (user, value-bucket) plane — a 64-tile grid,
    * of which the sparse fixture domains occupy 3 at sf0.001 / 8 at
    * sf0.01 / 34 at sf0.1); the re-read's per-file min/max spans are
    * exactly what a footer-stats reader sees. The audit counts how many
    * files such a reader must scan for a fixed 2-D rectangle predicate
    * under (a) the z-ordered layout and (b) an unclustered round-robin
    * layout of the SAME rows (`event_id % 64` — arrival-order ingest,
    * always 64 files): the z-order layout scans 1 file where round-robin
    * scans all 64 of its files, at every fixture SF. Bucket membership is
    * a pure function of the row, so the DuckDB oracle replays the whole
    * audit — including the file counts — from the raw table. At 100 TB
    * this is the difference between reading one row group and reading the
    * table; the write costs one extra sort. (The fixture write hashes on
    * the 64-way tile key — 64 tasks is plenty here; a production-scale
    * z-order write range-partitions on the full `zval` into thousands of
    * sorted files per `writeZOrdered` above, so tile skew spreads across
    * many tasks and per-file stats get strictly tighter than this
    * tile-level bound.) */
  def skippingAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = graft.sources.ParquetSink.memoFixture(spark, "zskip", sfDir) { d =>
      Tables
        .events(spark, sfDir)
        .select(
          $"event_id",
          pmod($"user_id".cast("long"), lit(1024L)).as("xb"),
          pmod(floor($"value").cast("long"), lit(1024L)).as("yb")
        )
        .withColumn("z_bucket", shiftright(zValue($"xb", $"yb"), 14))
        // all rows of a tile into one task → exactly one file per tile dir
        .repartition($"z_bucket")
        .write
        .partitionBy("z_bucket")
        .mode("overwrite")
        .parquet(d)
    }
    val back = spark.read.parquet(dir)
    val inRect = $"xb".between(4L, 11L) && $"yb".between(32L, 95L)
    // a min/max-stats reader scans a file iff its span INTERSECTS the
    // rectangle — a superset of files that actually hold matches
    def scanned(minX: Column, maxX: Column, minY: Column, maxY: Column): Column =
      maxX >= 4L && minX <= 11L && maxY >= 32L && minY <= 95L
    def fileStats(bucket: Column, tag: String) =
      back
        .groupBy(bucket.as("b"))
        .agg(min($"xb").as("mi_x"), max($"xb").as("ma_x"), min($"yb").as("mi_y"), max($"yb").as("ma_y"))
        .agg(
          count(lit(1)).as(s"${tag}_files"),
          sum(when(scanned($"mi_x", $"ma_x", $"mi_y", $"ma_y"), 1L).otherwise(0L)).as(s"${tag}_files_scanned")
        )
    val totals = back.agg(
      count(lit(1)).as("total_rows"),
      sum(when(inRect, 1L).otherwise(0L)).as("rows_selected")
    )
    totals
      .crossJoin(fileStats($"z_bucket".cast("long"), "zorder"))
      .crossJoin(fileStats(pmod($"event_id", lit(64L)), "natural"))
  }

  /** Declared query (q137): COMPOSED pruning audit — the q134 skipping
    * mechanism and the q127 bucketing idea stacked, over REAL files. The
    * events table is written once (memoized) in the layout a production
    * ingest lands: first-level directories on the ingest dimension
    * (`event_type`), second-level bucket directories on the user hash
    * (`ub = user_id % 16`), one file per (partition, bucket) by
    * construction (the pre-write repartition keys on exactly the two dir
    * columns, so a task's rows for one pair land as one file in that
    * pair's directory regardless of task collisions). A point lookup
    * (event_type = 'view' AND user_id = 7) then needs exactly ONE of the
    * ~80 files: the partition level prunes 4/5 of the directories, the
    * bucket level prunes 15/16 of the survivors — and because both levels
    * are DIRECTORY values, vanilla Spark's partition pruning does this at
    * planning time (ScaleTechniquesSpec asserts the physical scan reads
    * numFiles = 1 with both columns in PartitionFilters — not a modeled
    * reader, the actual one). Membership of every level is a pure
    * function of the row, so the DuckDB oracle replays the file counts
    * and the selected rows from the raw table. At 100 TB: the partition
    * level bounds a query to its ingest slice, the bucket level turns a
    * point lookup (or a bucket-aligned join) into a one-file read — both
    * paid once at write time. */
  def composedPruningAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = graft.sources.ParquetSink.memoFixture(spark, "pbprune", sfDir) { d =>
      Tables
        .events(spark, sfDir)
        .select(
          $"event_id",
          $"event_type",
          $"user_id",
          pmod($"user_id".cast("long"), lit(16L)).as("ub")
        )
        .repartition($"event_type", $"ub")
        .write
        .partitionBy("event_type", "ub")
        .mode("overwrite")
        .parquet(d)
    }
    val back = spark.read.parquet(dir)
    val hit  = $"event_type" === "view" && $"user_id" === 7L
    val fileCounts = back
      .groupBy($"event_type", $"ub")
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("total_files"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("files_scanned_partition"),
        sum(when($"event_type" === "view" && $"ub" === 7L, 1L).otherwise(0L))
          .as("files_scanned_composed")
      )
    back
      .agg(count(lit(1)).as("total_rows"), sum(when(hit, 1L).otherwise(0L)).as("rows_selected"))
      .crossJoin(fileCounts)
  }

  // One bucketed-table pair per (JVM, sfDir): q127 is constructed by
  // plan-only consumers too (the corpus sweep), so the two bucketed writes
  // must not repeat per construction. Table names are UUID-suffixed (the
  // temp-view discipline, DisciplineSpec) and the DATA lives in /tmp as
  // external tables — never in a ./spark-warehouse under the repo; the
  // shutdown hook removes the files (the in-memory catalog dies with the
  // JVM on its own).
  private val bucketTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()
  // Base dirs displaced by a catalog-revalidation rebuild: deleting them
  // inline would be a use-after-delete if the entry's original session is
  // still alive in this JVM (tableExists consults the CALLER's catalog,
  // which says nothing about other sessions' SharedStates) — so retire
  // them here and let the shutdown hook sweep them with everything else.
  private val retiredDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  sys.addShutdownHook {
    bucketTables.values.forEach { case (_, _, dir) =>
      graft.sources.ParquetSink.deleteRecursively(dir)
    }
    retiredDirs.forEach(graft.sources.ParquetSink.deleteRecursively)
  }

  /** Declared query (q127): bucketed CO-LOCATED join — the 100 TB answer
    * for a fact-fact join that runs repeatedly (BASELINE.md deployment
    * notes). Both sides are written `bucketBy(8, orderkey)` + sorted, so
    * the join and the downstream per-order aggregate plan with ZERO
    * shuffle exchanges: bucket pruning makes the exchange unnecessary,
    * paid once at write time instead of per query. PlanShapeSpec asserts
    * the no-Exchange plan; the oracle replays the join relationally. */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (liT, ordT, _) = bucketTables.compute(
      sfDir,
      (_, old) => {
        // revalidate: a different SparkSession in this JVM (fresh catalog)
        // must rebuild, not dangle on cached names
        if (old != null && spark.catalog.tableExists(old._1) && spark.catalog.tableExists(old._2))
          old
        else {
          // the rebuild REPLACES the map entry, so the old base dir would
          // otherwise vanish from the shutdown hook's view — retire it for
          // the hook to sweep at exit (NOT delete now: another still-live
          // session in this JVM may be reading those files)
          if (old != null) retiredDirs.add(old._3)
          val sfx  = java.util.UUID.randomUUID().toString.replace("-", "")
          val base = graft.sources.ParquetSink.scratchDir(spark, "bucketed") + "_" + sfx
          val liT  = s"graft_li_bucketed_$sfx"
          val ordT = s"graft_ord_bucketed_$sfx"
          Tables
            .lineitem(spark, sfDir)
            .select($"l_orderkey", $"l_quantity")
            .write
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", s"$base/li")
            .mode("overwrite")
            .saveAsTable(liT)
          Tables
            .orders(spark, sfDir)
            .select($"o_orderkey", $"o_totalprice")
            .write
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", s"$base/ord")
            .mode("overwrite")
            .saveAsTable(ordT)
          (liT, ordT, base)
        }
      }
    )
    spark
      .table(liT)
      .join(spark.table(ordT), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"), max($"o_totalprice").as("max_price"))
      .orderBy($"l_orderkey")
  }
}
