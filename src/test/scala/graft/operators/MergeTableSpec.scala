package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** File-pruned MERGE (q59 machinery): pruning soundness, by-reference
  * carry of untouched files, commit atomicity, crash replay.
  */
class MergeTableSpec extends SparkSpecBase {
  import java.nio.file.{Files, Path}

  private def mtimesOf(paths: Seq[String]): Map[String, Long] =
    paths.map(p => p -> Files.getLastModifiedTime(
      Path.of(java.net.URI.create(p))).toMillis).toMap

  private def table(n: Int) = {
    import spark.implicits._
    (1 to n).map(k => (k.toLong, s"seg${k % 4}", k * 1.5)).toDF("k", "seg", "bal")
  }

  test("merge rewrites only intersecting files; the rest carry by reference") {
    import spark.implicits._
    val dir = tmpDir("mergetab")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    assert(MergeTable.committedGen(dir).contains(0))
    val man0 = MergeTable.manifest(spark, dir).collect()
    assert(man0.length == 8, s"expected 8 files, got ${man0.length}")
    val paths0 = man0.map(_.getString(0)).toSeq
    val mt0 = mtimesOf(paths0)

    // change batch confined to k ≤ 100: U/D keys land in the lowest
    // file(s) only; inserts go beyond every range
    val changes = Seq(
      (10L, "U", "WEB", 999.0), (20L, "U", "WEB", 999.0),
      (30L, "D", null, 0.0),
      (5000L, "I", "NEW", 1.0), (5001L, "I", "NEW", 2.0)
    ).toDF("k", "op", "seg", "bal")
    val stats = MergeTable.merge(spark, dir, changes, "k")

    // pruning soundness: touched = exactly the manifest entries whose
    // range contains a U/D key (10, 20, 30)
    val expectedTouched = man0.filter(r =>
      Seq(10L, 20L, 30L).exists(k => k >= r.getLong(1) && k <= r.getLong(2)))
      .map(_.getString(0)).toSet
    assert(stats.touched.toSet == expectedTouched,
      s"touched ${stats.touched} != range-intersecting $expectedTouched")
    assert(stats.untouched.nonEmpty && stats.untouched.size >= 6,
      s"banded batch should leave most files untouched: ${stats.untouched.size}")

    // untouched files: still referenced by the committed manifest,
    // bytes untouched on disk (same mtime)
    assert(MergeTable.committedGen(dir).contains(1))
    val man1Paths = MergeTable.manifest(spark, dir).select("path")
      .collect().map(_.getString(0)).toSeq
    stats.untouched.foreach { p =>
      assert(man1Paths.contains(p), s"untouched $p dropped from manifest")
      assert(mtimesOf(Seq(p))(p) == mt0(p), s"untouched $p was rewritten")
    }
    stats.touched.foreach { p =>
      assert(!man1Paths.contains(p), s"touched $p still referenced after rewrite")
    }

    // value semantics ≡ the declarative whole-table merge
    val got = MergeTable.readTable(spark, dir)
      .select("k", "seg", "bal").as[(Long, String, Double)].collect().sorted
    val want = table(1000)
      .join(Seq((10L, "WEB", 999.0), (20L, "WEB", 999.0)).toDF("k", "u_seg", "u_bal"),
        Seq("k"), "left_outer")
      .filter(col("k") =!= 30L)
      .select(col("k"), coalesce(col("u_seg"), col("seg")).as("seg"),
        coalesce(col("u_bal"), col("bal")).as("bal"))
      .unionByName(Seq((5000L, "NEW", 1.0), (5001L, "NEW", 2.0)).toDF("k", "seg", "bal"))
      .as[(Long, String, Double)].collect().sorted
    assert(got.toSeq == want.toSeq, "pruned merge diverges from whole-table merge")
  }

  test("crash replay: orphaned next-gen dirs are swept, committed gen intact") {
    import spark.implicits._
    val dir = tmpDir("mergetab-crash")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 4)
    val before = MergeTable.readTable(spark, dir).count()
    // simulate a predecessor that died mid-merge: next-gen dirs exist,
    // marker never flipped
    Files.createDirectories(Path.of(dir, "files-g1"))
    Files.write(Path.of(dir, "files-g1", "garbage.parquet"), Array[Byte](1, 2, 3))
    Files.createDirectories(Path.of(dir, "manifest-g1"))
    assert(MergeTable.committedGen(dir).contains(0), "crash leaked a commit")
    assert(MergeTable.readTable(spark, dir).count() == before,
      "reader saw uncommitted files")
    // replay merges cleanly over the wreckage
    val changes = Seq((1L, "D", null, 0.0)).toDF("k", "op", "seg", "bal")
    MergeTable.merge(spark, dir, changes, "k")
    assert(MergeTable.committedGen(dir).contains(1))
    assert(MergeTable.readTable(spark, dir).count() == before - 1)
    assert(MergeTable.readTable(spark, dir).filter(col("k") === 1L).isEmpty)
  }

  test("update overlay is per-column: null value columns keep the target's") {
    import spark.implicits._
    val dir = tmpDir("mergetab-overlay")
    MergeTable.write(spark, table(50), "k", dir, nFiles = 2)
    val changes = Seq((7L, "U", "WEB", null.asInstanceOf[java.lang.Double]))
      .toDF("k", "op", "seg", "bal")
      .select(col("k"), col("op"), col("seg"), col("bal").cast("double"))
    MergeTable.merge(spark, dir, changes, "k")
    val r = MergeTable.readTable(spark, dir).filter(col("k") === 7L)
      .select("seg", "bal").as[(String, Double)].head()
    assert(r == ("WEB", 7 * 1.5), s"partial update broke the overlay: $r")
  }

  test("vacuum drops only unreferenced files; committed table reads identically") {
    import spark.implicits._
    val dir = tmpDir("mergetab-vacuum")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val stats = MergeTable.merge(spark, dir,
      Seq((10L, "U", "WEB", 1.0), (990L, "D", null: String, 0.0))
        .toDF("k", "op", "seg", "bal"), "k")
    // plus a crashed-commit artifact vacuum should sweep
    Files.write(Path.of(dir, "_committed.tmp-g9"), "9\n".getBytes)
    val before = MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq
    val deleted = MergeTable.vacuum(spark, dir)
    assert(deleted > 0, "vacuum found nothing despite superseded files")
    // superseded gen-0 files and the old manifest are gone...
    stats.touched.foreach(p =>
      assert(!Files.exists(Path.of(java.net.URI.create(p))), s"superseded $p survived"))
    assert(!Files.exists(Path.of(dir, "manifest-g0")), "old manifest survived")
    assert(!Files.exists(Path.of(dir, "_committed.tmp-g9")), "stale marker survived")
    // ...every live file (including gen-0 untouched carries) remains,
    // and the committed read is unchanged
    stats.untouched.foreach(p =>
      assert(Files.exists(Path.of(java.net.URI.create(p))), s"live $p vacuumed"))
    val after = MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(after == before, "vacuum changed the committed table's rows")
    // idempotent: a second vacuum finds nothing new to delete
    assert(MergeTable.vacuum(spark, dir) == 0)
  }

  test("delete-everything merge leaves a consistent (possibly emptier) table") {
    import spark.implicits._
    val dir = tmpDir("mergetab-empty")
    MergeTable.write(spark, table(10), "k", dir, nFiles = 1)
    val changes = (1 to 10).map(k => (k.toLong, "D", null: String, 0.0))
      .toDF("k", "op", "seg", "bal")
    val stats = MergeTable.merge(spark, dir, changes, "k")
    assert(stats.untouched.isEmpty)
    assert(MergeTable.manifest(spark, dir).isEmpty, "manifest should be empty")
  }
}
