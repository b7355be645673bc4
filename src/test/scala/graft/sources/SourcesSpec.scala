package graft.sources

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpecBase {

  test("every batch format round-trips the nation table losslessly") {
    val nation = Tables.nation(spark, sfDir)
    val expected = nation.orderBy("n_nationkey").collect().toSeq
    Sources.formats.foreach { fmt =>
      val path = tmpDir(s"src-$fmt")
      Sources.write(nation, fmt, path)
      val back = Sources.read(spark, fmt, path)
        .select(nation.columns.map(col): _*)
      // csv/json round-trip through text: compare on a normalized view
      val got = back.orderBy("n_nationkey").collect().toSeq
      assert(got.size == expected.size, s"$fmt: row count")
      assert(got.map(_.getAs[Any]("n_name")) == expected.map(_.getAs[Any]("n_name")),
        s"$fmt: names differ")
    }
  }

  test("partitioned write produces a prunable layout") {
    val path = tmpDir("src-part")
    Sources.write(Tables.orders(spark, sfDir), "parquet", path,
      partitionBy = Seq("o_orderstatus"))
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("o_orderstatus="))
    assert(dirs.nonEmpty)
    // partition-pruned read only touches one directory
    val one = Sources.read(spark, "parquet", path).filter(col("o_orderstatus") === "F")
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
  }

  test("schema evolution: mergeSchema unions per-file schemas") {
    import spark.implicits._
    val path = tmpDir("src-evolve")
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$path/v1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$path/v2")
    val merged = Sources.readMerged(spark, s"$path/*")
    assert(merged.columns.toSet == Set("id", "name", "score"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2) && byId(2L).getDouble(2) == 9.5)
  }

  test("compaction: many small files -> targetFiles, data intact") {
    val path = tmpDir("src-compact") + "/t"
    Tables.lineitem(spark, sfDir).repartition(64).write.parquet(path)
    val before = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 64)
    val rows = spark.read.parquet(path).count()
    Sources.compact(spark, path, targetFiles = 2)
    val after = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 2)
    assert(spark.read.parquet(path).count() == rows)
  }

  test("streaming file spout reads with explicit schema") {
    val path = tmpDir("src-stream")
    Sources.write(Tables.nation(spark, sfDir), "json", path)
    val stream = Sources.fileStream(spark, "json", path, Tables.nation(spark, sfDir).schema)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("srcstream").start()
    try {
      q.processAllAvailable()
      assert(spark.table("srcstream").count() == 25)
    } finally q.stop()
  }
}
