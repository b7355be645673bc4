package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** In-place OPTIMIZE ZORDER: layout changes, content doesn't — rows
  * identical, CDC nets to zero across the recluster, pruning on the
  * clustered dimensions is restored, history/time-travel intact.
  */
class ReclusterSpec extends SparkSpecBase {
  import spark.implicits._

  // 64×64 grid keyed by row-major id: a key-range write makes x a
  // slab dimension (selective) and y useless; recluster on (x, y)
  // must make BOTH selective
  private def grid = (0 until 64 * 64).map { i =>
    (i.toLong, (i % 64).toLong, (i / 64).toLong, i * 1.5)
  }.toDF("k", "x", "y", "bal")

  private def admitted(dir: String, c: String, lo: Long, hi: Long): Int = {
    val man = MergeTable.manifest(spark, dir).collect()
    man.count { r =>
      val mn = r.getAs[Long](s"min_$c"); val mx = r.getAs[Long](s"max_$c")
      !(mx < lo || mn > hi)
    }
  }

  test("recluster restores multi-dimensional pruning without changing content") {
    val dir = tmpDir("reclus")
    MergeTable.write(spark, grid, "k", dir, nFiles = 16)
    // key-slab layout: row-major k makes y contiguous per file (4
    // grid rows each) and x useless — an x band admits every file
    assert(admitted(dir, "x", 10, 13) == 16)
    val before = MergeTable.readTable(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sorted

    val stats = MergeTable.recluster(spark, dir, "k", Seq("x", "y"))
    assert(stats.gen == 1)
    assert(stats.untouched.isEmpty && stats.touched.size == 16)

    // content identical, row for row
    val after = MergeTable.readTable(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sorted
    assert(after.toSeq == before.toSeq)
    // CDC across the recluster nets to ZERO logical changes even
    // though every physical file was replaced
    assert(MergeTable.changesBetween(spark, dir, 0, 1, "k").count() == 0)
    // both dimensions now prune (same bound the writeClustered spec uses)
    assert(admitted(dir, "x", 10, 13) <= 10)
    assert(admitted(dir, "y", 10, 13) <= 10)
    // lineage + time travel
    val hist = MergeTable.history(spark, dir).select("gen", "op")
      .as[(Int, String)].collect().toSeq
    assert(hist == Seq((1, "cluster"), (0, "write")))
    assert(MergeTable.readTable(spark, dir, asOf = Some(0)).count() == 64 * 64)
  }

  test("partial recluster rewrites ONLY the degraded files; carries are byte-untouched") {
    val dir = tmpDir("reclus3")
    MergeTable.writeClustered(spark, grid, "k", Seq("x", "y"), dir, nFiles = 16)
    val freshAdmit = admitted(dir, "x", 10, 13)
    assert(freshAdmit <= 10)
    val gen0Paths = MergeTable.manifest(spark, dir).select("path")
      .collect().map(_.getString(0)).toSet
    // a low-slab merge (bal-only updates) strews key-ordered files
    // across the z layout
    val changes = (0 until 512).map(i =>
      (i.toLong, "U", (i % 64).toLong, (i / 64).toLong, i * 2.0))
      .toDF("k", "op", "x", "y", "bal")
    MergeTable.merge(spark, dir, changes, "k")
    val mergedPaths = MergeTable.manifest(spark, dir).select("path")
      .collect().map(_.getString(0)).toSet
    val degraded = mergedPaths -- gen0Paths
    val carried = mergedPaths.intersect(gen0Paths)
    assert(degraded.nonEmpty && carried.size >= 8,
      s"fixture degenerate: ${degraded.size} degraded / ${carried.size} carried")
    val degradedAdmit = admitted(dir, "x", 10, 13)
    val mtimes = carried.map { p =>
      val f = java.nio.file.Path.of(java.net.URI.create(p))
      p -> java.nio.file.Files.getLastModifiedTime(f)
    }.toMap

    val st = MergeTable.reclusterPartial(spark, dir, "k", Seq("x", "y"))
    assert(st.gen == 2)
    // exactly the merge's outputs rewrote; every clustered file carried
    assert(st.touched.toSet == degraded, s"touched ${st.touched}")
    assert(st.untouched.toSet == carried)
    // carried files are byte-untouched (mtime-pinned) and still live
    val finalPaths = MergeTable.manifest(spark, dir).select("path")
      .collect().map(_.getString(0)).toSet
    assert(carried.subsetOf(finalPaths))
    mtimes.foreach { case (p, t) =>
      val f = java.nio.file.Path.of(java.net.URI.create(p))
      assert(java.nio.file.Files.getLastModifiedTime(f) == t, s"carried $p rewritten")
    }
    // content identical: CDC across the partial recluster nets to zero
    assert(MergeTable.changesBetween(spark, dir, 1, 2, "k").count() == 0)
    // band admission restored to the fresh-layout count
    val restored = admitted(dir, "x", 10, 13)
    assert(restored <= freshAdmit && restored <= degradedAdmit,
      s"admission not restored: fresh $freshAdmit, degraded $degradedAdmit, restored $restored")
    // history tags the commit as a cluster op, so the NEXT partial
    // uses THIS generation as its baseline: an immediate re-run no-ops
    val st2 = MergeTable.reclusterPartial(spark, dir, "k", Seq("x", "y"))
    assert(st2.gen == 2 && st2.touched.isEmpty)
    assert(MergeTable.committedGen(dir).contains(2))
    // rows still equal the declarative merge result
    val got = MergeTable.readTable(spark, dir)
      .select(sum(col("bal")).cast("double")).head().getDouble(0)
    val want = grid.select(sum(when(col("k") < 512, col("k") * 2.0)
      .otherwise(col("bal")))).head().getDouble(0)
    assert(math.abs(got - want) < 1e-6)
  }

  test("partial recluster on a never-clustered table degenerates to the full rewrite") {
    val dir = tmpDir("reclus4")
    MergeTable.write(spark, grid, "k", dir, nFiles = 8)
    val st = MergeTable.reclusterPartial(spark, dir, "k", Seq("x", "y"))
    assert(st.gen == 1 && st.untouched.isEmpty && st.touched.size == 8)
    assert(admitted(dir, "x", 10, 13) <= 6)
    assert(MergeTable.readTable(spark, dir).count() == 64 * 64)
  }

  test("partial recluster on DIFFERENT columns than the baseline rewrites fully, not falsely-carries") {
    val dir = tmpDir("reclus5")
    MergeTable.writeClustered(spark, grid, "k", Seq("x", "y"), dir, nFiles = 8)
    // same commit history, different requested dimensions: carrying
    // the (x,y)-tiled files as "clustered" would report a (k,bal)
    // repair that never happened — the column mismatch must force the
    // full rewrite (and NOT no-op at the old generation)
    val st = MergeTable.reclusterPartial(spark, dir, "k", Seq("k", "bal"))
    assert(st.gen == 1 && st.untouched.isEmpty && st.touched.size == 8,
      s"mismatched-column partial must rewrite fully: $st")
    // and a subsequent SAME-column partial uses the new baseline: no-op
    val st2 = MergeTable.reclusterPartial(spark, dir, "k", Seq("k", "bal"))
    assert(st2.gen == 1 && st2.touched.isEmpty)
    // a string cluster column fails loudly on the partial path too
    // (the manifest-bounds shortcut must not accept castable stats)
    val sdir = tmpDir("reclus5s")
    MergeTable.write(spark,
      grid.withColumn("tag", concat(lit("t"), col("k"))), "k", sdir, nFiles = 4)
    intercept[IllegalArgumentException] {
      MergeTable.reclusterPartial(spark, sdir, "k", Seq("tag"))
    }
  }

  test("recluster after a degrading merge; constraints and bloom index stay sound") {
    val dir = tmpDir("reclus2")
    MergeTable.writeClustered(spark, grid, "k", Seq("x", "y"), dir, nFiles = 16)
    assert(admitted(dir, "x", 10, 13) <= 10)
    MergeTable.addCheckConstraint(spark, dir, "bal-pos", "bal >= 0")
    // a broad merge rewrites key-ordered, degrading the z layout
    val changes = (0 until 64 * 64 by 3).map(i =>
      (i.toLong, "U", (i % 64).toLong, (i / 64).toLong, i * 2.0))
      .toDF("k", "op", "x", "y", "bal")
    MergeTable.merge(spark, dir, changes, "k")

    val stats = MergeTable.recluster(spark, dir, "k", Seq("x", "y"))
    assert(stats.gen == 2)
    assert(admitted(dir, "x", 10, 13) <= 10, "recluster must restore x pruning")
    // content still equals the declarative merge result
    val got = MergeTable.readTable(spark, dir)
      .select(sum(col("bal")).cast("double")).head().getDouble(0)
    val want = grid.select(sum(when(col("k") % 3 === 0, col("k") * 2.0)
      .otherwise(col("bal")))).head().getDouble(0)
    assert(math.abs(got - want) < 1e-6)
    // a violating merge is still rejected on the reclustered table
    intercept[IllegalStateException] {
      MergeTable.merge(spark, dir,
        Seq((1L, "U", 1L, 0L, -9.0)).toDF("k", "op", "x", "y", "bal"), "k")
    }
    assert(MergeTable.committedGen(dir).contains(2))
  }
}
