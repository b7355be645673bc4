package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** r21 equivalence oracle for the footer-derived manifest stats: the
  * zero-rescan fast path of MergeTable.statsOf must agree with the
  * original scan-based pass (statsOfJob) on every cell a consumer
  * reads — path strings (input_file_name's exact URI form: bloom
  * sidecars and cross-generation carries compare them verbatim),
  * n_rows, native-typed min/max (string bounds through the same
  * truncation pair) and nn null counts — across the full statted type
  * set, null mixes, long/non-ASCII strings, and multi-file layouts.
  */
class FooterStatsSpec extends SparkSpecBase {

  /** Both passes over the same written dir, compared row-by-row as
    * path-keyed maps.
    */
  private def assertAgree(dataDir: String, keyCol: String): Unit = {
    val fast = MergeTable.statsOf(spark, dataDir, keyCol)
    val slow = MergeTable.statsOfJob(spark, dataDir, keyCol)
    assert(fast.schema.fieldNames.toSeq == slow.schema.fieldNames.toSeq,
      s"stat columns diverge: ${fast.schema.fieldNames.toSeq} vs " +
        s"${slow.schema.fieldNames.toSeq}")
    val cols = fast.schema.fieldNames.toSeq
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> cols.tail.map(c =>
        c -> r.getAs[Any](c)).toMap).toMap
    val (f, sl) = (keyed(fast), keyed(slow))
    assert(f.keySet == sl.keySet,
      s"path sets diverge (input_file_name form broken?):\n  footer=${f.keySet}\n  scan=${sl.keySet}")
    for ((p, cells) <- f; (c, v) <- cells)
      assert(v == sl(p)(c), s"cell $c of $p diverges: footer=$v scan=${sl(p)(c)}")
  }

  test("footer stats ≡ scan stats: long key, string, double, int, date, nulls") {
    import spark.implicits._
    val dir = tmpDir("fstats-mixed")
    val df = (1 to 500).map { i =>
      (i.toLong,
        if (i % 7 == 0) null else f"tag-$i%04d",
        if (i % 11 == 0) null else java.lang.Double.valueOf(i * 1.25),
        i % 50,
        java.sql.Date.valueOf(java.time.LocalDate.of(2030, 1, 1).plusDays(i % 300)))
    }.toDF("k", "tag", "bal", "bucket", "d")
    df.repartitionByRange(4, col("k")).write.mode("overwrite").parquet(dir)
    assertAgree(dir, "k")
  }

  test("footer stats ≡ scan stats: long / non-ASCII string keys (truncation pair)") {
    import spark.implicits._
    val longKeys = (1 to 200).map(i => (f"user-$i%05d-" + "x" * 60, i * 2.0))
      .toDF("k", "bal")
    val d1 = tmpDir("fstats-longkey")
    longKeys.repartitionByRange(4, col("k")).write.mode("overwrite").parquet(d1)
    assertAgree(d1, "k")

    // 32-char prefix with no incrementable ASCII char → max_k NULL on
    // both passes (the can't-prune stat), min_k the code-point prefix
    val nonAscii = (1 to 120).map(i => ("é" * 40 + f"$i%05d", i * 1.0))
      .toDF("k", "bal")
    val d2 = tmpDir("fstats-nonascii")
    nonAscii.repartitionByRange(3, col("k")).write.mode("overwrite").parquet(d2)
    assertAgree(d2, "k")
  }

  test("footer stats ≡ scan stats: all-null column and single-file layout") {
    import spark.implicits._
    val dir = tmpDir("fstats-allnull")
    val df = (1 to 50).map(i => (i.toLong, null: String, i * 1.0))
      .toDF("k", "note", "bal")
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    assertAgree(dir, "k")
  }

  test("footer stats ≡ scan stats: timestamp key and value columns (r22)") {
    import spark.implicits._
    def tsFrame = (1 to 300).map { i =>
      (java.sql.Timestamp.from(
         java.time.Instant.parse("2030-01-01T00:00:00Z").plusSeconds(i * 37L)),
       i.toLong,
       if (i % 9 == 0) null
       else java.sql.Timestamp.from(
         java.time.Instant.parse("2031-06-15T12:00:00Z").plusMillis(i * 13L)))
    }.toDF("ts", "k", "seen")
    // INT64 micros layout (isAdjustedToUTC) — the r22 extension of the
    // proven footer type set; min/max over micros is the same monotone
    // order the scan's min/max use
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    val dir = tmpDir("fstats-ts64")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      tsFrame.repartitionByRange(3, col("ts")).write.mode("overwrite").parquet(dir)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val before = MergeTable.statsJobFallbackCount
    // as a non-key statted column and as the key itself — both footer
    assertAgree(dir, "k")
    assertAgree(dir, "ts")
    assert(MergeTable.statsJobFallbackCount == before,
      "INT64 timestamp layout unexpectedly took the job fallback")

    // the DEFAULT writer layout (INT96, whose deprecated stats
    // parquet-mr does not expose reliably) takes the COUNTED job
    // fallback wholesale — behavior, not speed, stays the invariant
    assert(prev == "INT96", s"Spark's default timestamp layout changed to $prev " +
      "— re-examine the INT96 fallback gate")
    val dir96 = tmpDir("fstats-ts96")
    tsFrame.repartitionByRange(3, col("ts")).write.mode("overwrite").parquet(dir96)
    val b96 = MergeTable.statsJobFallbackCount
    val out = MergeTable.statsOf(spark, dir96, "ts")
    assert(MergeTable.statsJobFallbackCount == b96 + 1,
      "INT96 timestamp layout did not take the counted job fallback")
    val slow = MergeTable.statsOfJob(spark, dir96, "ts")
    assert(out.collect().map(_.toSeq).toSet == slow.collect().map(_.toSeq).toSet)
  }

  test("NaN-poisoned double bounds: footer degrades to can't-prune null (r22)") {
    import spark.implicits._
    // parquet drops NaN-poisoned float/double column statistics, so
    // the footer path records null (can't-prune) bounds where the
    // scan's max() yields NaN — the one DOCUMENTED divergence from
    // cell equivalence, pinned here: always the SOUND direction
    // (admit, never prune), and nn still agrees
    val dir = tmpDir("fstats-nan")
    val df = (1 to 80).map(i =>
      (i.toLong, if (i % 10 == 0) Double.NaN else i * 0.5))
      .toDF("k", "v")
    df.coalesce(2).write.mode("overwrite").parquet(dir)
    val fast = MergeTable.statsOf(spark, dir, "k").collect()
      .map(r => r.getString(0) -> r).toMap
    val slow = MergeTable.statsOfJob(spark, dir, "k").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fast.keySet == slow.keySet)
    for ((p, f) <- fast) {
      val s = slow(p)
      // the key column (NaN-free) stays cell-equivalent
      assert(f.getAs[Any]("min_k") == s.getAs[Any]("min_k"))
      assert(f.getAs[Any]("max_k") == s.getAs[Any]("max_k"))
      // v: footer yields null bounds (sound), scan yields NaN max
      assert(f.isNullAt(f.fieldIndex("min_v")) && f.isNullAt(f.fieldIndex("max_v")),
        s"expected can't-prune null bounds for NaN-poisoned v at $p: $f")
      assert(s.getAs[Double]("max_v").isNaN)
      // the null counts agree (NaN is not null)
      assert(f.getAs[Long]("nn_v") == s.getAs[Long]("nn_v"))
    }
  }

  test("mixed-schema data dir falls back to the scan pass (r22 drift check)") {
    import spark.implicits._
    val dir = tmpDir("fstats-drift")
    (1 to 40).map(i => (i.toLong, i * 1.0)).toDF("k", "bal")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // a second file with an extra column — two distinct footer schemas
    (41 to 80).map(i => (i.toLong, i * 1.0, s"s$i")).toDF("k", "bal", "extra")
      .coalesce(1).write.mode("append").parquet(dir)
    // statsOf must take the job path, not stat columns positionally
    // against one arbitrary file's layout
    val before = MergeTable.statsJobFallbackCount
    val out = MergeTable.statsOf(spark, dir, "k")
    assert(MergeTable.statsJobFallbackCount == before + 1,
      "mixed-schema dir did not take the counted job fallback")
    val slow = MergeTable.statsOfJob(spark, dir, "k")
    assert(out.collect().map(_.toSeq).toSet == slow.collect().map(_.toSeq).toSet)
  }

  test("unsupported statted type (decimal) falls back to the scan pass") {
    import spark.implicits._
    val dir = tmpDir("fstats-decimal")
    val df = (1 to 60).map(i => (i.toLong, BigDecimal(i) / 4))
      .toDF("k", "amt")
    df.coalesce(2).write.mode("overwrite").parquet(dir)
    // statsOf must still produce the full stat set (via the job path)
    val out = MergeTable.statsOf(spark, dir, "k")
    assert(out.columns.contains("min_amt") && out.columns.contains("nn_k"))
    val slow = MergeTable.statsOfJob(spark, dir, "k")
    assert(out.collect().map(_.toSeq).toSet == slow.collect().map(_.toSeq).toSet)
  }

  test("the whole write→merge path keeps manifest paths joinable against scans") {
    import spark.implicits._
    // end-to-end: the manifest written through the footer path must
    // name exactly the strings input_file_name() reports when the
    // committed files are scanned — the bloom-sidecar join contract
    val dir = tmpDir("fstats-contract")
    val base = (1 to 400).map(i => (i.toLong, s"seg${i % 3}", i * 1.5))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, base, "k", dir, nFiles = 4)
    val changes = Seq((10L, "U", "WEB", 9.0), (4000L, "I", "NEW", 1.0))
      .toDF("k", "op", "seg", "bal")
    MergeTable.merge(spark, dir, changes, "k")
    val manPaths = MergeTable.manifest(spark, dir)
      .select("path").collect().map(_.getString(0)).toSet
    val scanPaths = MergeTable.readTable(spark, dir)
      .select(input_file_name().as("p")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(scanPaths == manPaths,
      s"manifest paths diverge from input_file_name:\n  man=$manPaths\n  scan=$scanPaths")
  }
}
