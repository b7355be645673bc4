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
