package graft

import graft.operators.{AsOf, Multimodal}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Literal-data semantics tests for operators whose oracle check alone
  * doesn't pin the interesting edge cases. */
class OperatorSpec extends SparkSpec {

  private def t(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("as-of join: purchase picks the latest view at-or-before it, else null") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view@1, view@5, purchase@7 -> last view 5; purchase@3 -> view 1
      (1L, t(1), 101L, "view"),
      (1L, t(5), 102L, "view"),
      (1L, t(3), 103L, "purchase"),
      (1L, t(7), 104L, "purchase"),
      // user 2: purchase with no prior view -> null
      (2L, t(4), 201L, "purchase"),
      // user 3: view at the same instant as purchase counts (at-or-before)
      (3L, t(9), 301L, "view"),
      (3L, t(9), 302L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    ev.createOrReplaceTempView("asof_fixture")

    // run the same logic as lastViewBeforePurchase but over the fixture
    val views     = ev.filter($"event_type" === "view").select($"user_id", $"ts", $"event_id", lit(0).as("tag"))
    val purchases = ev.filter($"event_type" === "purchase").select($"user_id", $"ts", $"event_id", lit(1).as("tag"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = views.unionByName(purchases)
      .withColumn("last_view_ts", last(when($"tag" === 0, $"ts"), ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"last_view_ts")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Timestamp].getTime / 60000))
      .toMap
    assert(out(103L) === Some(1L))
    assert(out(104L) === Some(5L))
    assert(out(201L) === None)
    assert(out(302L) === Some(9L), "view at the same instant is at-or-before")
  }

  test("as-of query runs on the fixture table with deterministic output") {
    val df = AsOf.lastViewBeforePurchase(spark, sf)
    assert(df.columns.toSeq === Seq("event_id", "user_id", "ts_us", "last_view_ts_us"))
  }

  test("image features: real PNG decode matches the closed-form raster") {
    val feats = Multimodal.imageFeatures(spark, sf).limit(5).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val (w, h) = ((d % 16 + 4).toInt, (d % 12 + 4).toInt)
      val vals = (0L until w.toLong * h * 3).map(k => ((d * 31L + k * 7L) % 256L).toInt)
      assert(r.getAs[Int]("width") === w)
      assert(r.getAs[Int]("height") === h)
      assert(r.getAs[Long]("pix_sum") === vals.map(_.toLong).sum)
      assert(r.getAs[Int]("pix_min") === vals.min)
      assert(r.getAs[Int]("pix_max") === vals.max)
      assert(r.getAs[Long]("n_gt128") === vals.count(_ > 128).toLong)
    }
  }

  test("audio features: real WAV round trip — header rate + signal stats match closed form") {
    val feats = Multimodal.audioFeatures(spark, sf).filter("window_idx = 1").limit(3).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val s = (160 until 320).map(t => ((d * 7919L + t * 104729L) % 4096L).toInt - 2048)
      assert(r.getAs[Int]("sample_rate") === 16000, "sample_rate must come from the decoded RIFF header")
      assert(r.getAs[Long]("energy") === s.map(v => v.toLong * v).sum)
      assert(r.getAs[Int]("peak") === s.map(math.abs).max)
      assert(
        r.getAs[Long]("n_zero_cross") ===
          s.sliding(2).count(p => p.head.toLong * p.last < 0).toLong)
    }
  }

  test("image pHash near-dup: planted re-encodes pair with their originals") {
    import spark.implicits._
    val pairs = Multimodal.imagePhashPairs(spark, sf).cache()
    assert(pairs.filter($"hamming" > 6 || $"hamming" < 0).count() === 0)
    assert(pairs.filter($"id1" >= $"id2").count() === 0, "pairs are (smaller, larger)")
    // planted near-dups (+5M ids, pixel salt +1 → identical raster except
    // at 255→0 wraps) must band-match and verify for nearly all docs; the
    // few misses are the honest Hamming-LSH recall gap (>3 flipped bits
    // spread across all 4 bands), replayed identically by the oracle
    val nCopies = Tables.documents(spark, sf).filter($"doc_id" % 9 === 0).count()
    val planted = pairs.filter($"id2" === $"id1" + 5000000L).count()
    assert(planted >= (nCopies * 8) / 10, s"found only $planted of $nCopies planted near-dups")
    pairs.unpersist()
  }

  test("image dedup endgame: linear output, survivor election consistent with the pair graph") {
    import spark.implicits._
    val out = Multimodal.imageDedupEndgame(spark, sf).cache()
    val nImages = Tables.documents(spark, sf).count() +
      Tables.documents(spark, sf).filter($"doc_id" % 9 === 0).count()
    assert(out.count() === nImages, "exactly one row per image — the linear-output contract")
    // survivors are their own cluster id; every cluster has exactly one
    assert(out.filter($"is_kept" && $"cluster_id" =!= $"doc_id").count() === 0)
    val perCluster = out.groupBy($"cluster_id")
      .agg(sum($"is_kept".cast("long")).as("nk"), count(lit(1)).as("n"), first($"cluster_images").as("ci"))
    assert(perCluster.filter($"nk" =!= 1).count() === 0, "one survivor per cluster")
    assert(perCluster.filter($"n" =!= $"ci").count() === 0, "cluster_images equals member count")
    // the survivor is the min doc_id of its cluster (min-label election)
    val minIds = out.groupBy($"cluster_id").agg(min($"doc_id").as("mn"))
    assert(minIds.filter($"cluster_id" =!= $"mn").count() === 0)
    // every q178 near-dup pair lands in one cluster (banding is shared,
    // and exact-hash members ride their representative)
    val cl = out.select($"doc_id", $"cluster_id")
    val crossPairs = Multimodal.imagePhashPairs(spark, sf)
      .join(cl.withColumnRenamed("doc_id", "id1").withColumnRenamed("cluster_id", "c1"), "id1")
      .join(cl.withColumnRenamed("doc_id", "id2").withColumnRenamed("cluster_id", "c2"), "id2")
      .filter($"c1" =!= $"c2")
    assert(crossPairs.count() === 0, "no verified pair may straddle two clusters")
    out.unpersist()
  }

  test("image file dedup (q180): binaryFile route keeps the endgame contract over real PNG files") {
    import spark.implicits._
    val out = Multimodal.imageFileDedup(spark, sf).cache()
    // the fixture slice: every %3 doc (≤1200) plus planted %9 re-encodes
    val slice = Tables.documents(spark, sf).filter($"doc_id" % 3 === 0)
      .select($"doc_id").orderBy($"doc_id").limit(1200).as[Long].collect().toSet
    val expectIds = slice ++ slice.filter(_ % 9 == 0).map(_ + 5000000L)
    assert(out.count() === expectIds.size.toLong, "one row per PNG file — the linear-output contract")
    assert(out.select($"doc_id").as[Long].collect().toSet === expectIds,
      "ids parsed from file paths must be exactly the written fixture set")
    // survivor/cluster invariants, as q179's
    assert(out.filter($"is_kept" && $"cluster_id" =!= $"doc_id").count() === 0)
    val perCluster = out.groupBy($"cluster_id")
      .agg(sum($"is_kept".cast("long")).as("nk"), count(lit(1)).as("n"), first($"cluster_images").as("ci"))
    assert(perCluster.filter($"nk" =!= 1).count() === 0, "one survivor per cluster")
    assert(perCluster.filter($"n" =!= $"ci").count() === 0, "cluster_images equals member count")
    // the planted re-encode (pixel +1 mod 256) should OVERWHELMINGLY
    // cluster with its base image — a decode regression on the FILE route
    // (truncated bytes, wrong column) collapses this to ~0%. Not 100% by
    // design: banding is pigeonhole-complete only for Hamming ≤3 (the
    // q65/q66/q178 recall contract), and a 255→0 wrap can push a planted
    // pair past the ≤6 verify; measured 1-2 strays per SF.
    val cl = out.select($"doc_id", $"cluster_id")
    val planted = cl.filter($"doc_id" >= 5000000L)
      .select(($"doc_id" - 5000000L).as("base"), $"cluster_id".as("cp"))
    val straddling = planted.join(cl.withColumnRenamed("doc_id", "base"), "base")
      .filter($"cp" =!= $"cluster_id")
      .count()
    val nPlanted = planted.count()
    assert(straddling <= nPlanted / 10,
      s"planted near-dups must cluster with their base (got $straddling/$nPlanted astray)")
    out.unpersist()
  }

  test("audio dedup (q182): re-containerized copies collapse on decoded content, not bytes") {
    import spark.implicits._
    val out = Multimodal.audioDedup(spark, sf).cache()
    val planted = out.filter($"doc_id" >= 7000000L).cache()
    // the containers really differ: every planted file carries the extra
    // 26-byte LIST chunk; every original is canonical
    assert(planted.filter($"n_bytes" =!= 1030L).count() === 0)
    assert(out.filter($"doc_id" < 7000000L && $"n_bytes" =!= 1004L).count() === 0)
    // ...and the decode collapses them anyway: every planted copy's group
    // representative is its base (or an even-smaller same-signal class
    // member) — never itself
    assert(planted.filter($"is_kept").count() === 0, "a re-containerized copy must never survive")
    val withBase = planted
      .select(($"doc_id" - 7000000L).as("base"), $"pcm_md5".as("pm"))
      .join(out.withColumnRenamed("doc_id", "base"), "base")
    assert(withBase.filter($"pm" =!= $"pcm_md5").count() === 0,
      "planted copy and base must share the content fingerprint")
    out.unpersist(); planted.unpersist()
  }

  test("frame sample emits exactly frames 0 and 2 per document") {
    import spark.implicits._
    val fs = Multimodal.frameSample(spark, sf).cache()
    val perDoc = fs.groupBy($"doc_id").agg(count(lit(1)).as("n"), array_sort(collect_list($"frame_idx")).as("idx"))
    assert(perDoc.filter($"n" =!= 2).count() === 0)
    assert(perDoc.filter(!($"idx" === array(lit(0), lit(2)))).count() === 0)
  }

  test("Tables.events normalizes a TIMESTAMP_NTZ ts fixture even when NTZ inference is on") {
    import spark.implicits._
    // regression for the 2026-08-13 fixture regeneration: events.ts became
    // parquet timestamp[us] with isAdjustedToUTC=false, which an
    // externally-built session (inferTimestampNTZ=true, the Spark 4
    // default) reads as TIMESTAMP_NTZ — Tables.events must cast it back to
    // TimestampType (UTC session = DuckDB's naive read) or every
    // unix_micros/window consumer breaks
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_events").toString
    val prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // row 2 sits INSIDE America/New_York's 2026 spring-forward gap
      // (2026-03-08 02:00-03:00 does not exist in that zone): a zone
      // round-trip (cast + from_utc_timestamp) resolves it +1h and cannot
      // invert; the zone-free field reassembly must read it exactly
      Seq(
        (1L, "2024-01-02 03:04:05.123456", 7L, "view", 1.5, "{}"),
        (2L, "2026-03-08 02:30:00", 7L, "view", 1.5, "{}")
      )
        .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
        .select($"event_id", $"ts_s".cast("timestamp_ntz").as("ts"), $"user_id", $"event_type", $"value", $"props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      // the naive-as-UTC interpretation must NOT depend on the caller's
      // session zone (an external session won't have tuned it to UTC)
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
      val us = ev.orderBy($"event_id").select(unix_micros($"ts")).as[Long].collect()
      assert(us(0) === 1704164645123456L, s"naive value must be read as UTC in any session zone, got ${us(0)}")
      val gapExpected = java.time.Instant.parse("2026-03-08T02:30:00Z").toEpochMilli * 1000L
      assert(us(1) === gapExpected, s"DST-gap naive value must survive exactly, got ${us(1)} want $gapExpected")
    } finally {
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
      spark.conf.set("spark.sql.session.timeZone", prevTz)
      graft.sources.ParquetSink.deleteRecursively(dir)
    }
  }
}
