package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Deletion vectors: scattered-key DELETE as a metadata commit —
  * data files byte-identical, every read path exact through the
  * vector anti-join, rewriting ops prune entries for the files they
  * replace (never resurrecting hidden rows), compaction
  * materializes, CDC reports the hidden rows as D with no DML-side
  * bookkeeping, and time travel / restore / clone / vacuum follow
  * the manifest's exact lifecycle.
  */
class DeletionVectorSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkTable(dir: String, n: Int = 1000, files: Int = 8): Unit =
    MergeTable.write(spark,
      (1 to n).map(k => (k.toLong, s"s${k % 4}", k * 1.5)).toDF("k", "seg", "bal"),
      "k", dir, nFiles = files)

  private def keysOf(dir: String): Set[Long] =
    MergeTable.readTable(spark, dir).select("k").as[Long].collect().toSet

  private def mtimes(dir: String): Map[String, Long] =
    MergeTable.manifest(spark, dir).select("path").collect().map { r =>
      val p = java.nio.file.Path.of(java.net.URI.create(r.getString(0)))
      p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis
    }.toMap

  test("scattered delete hides rows with zero data bytes rewritten; idempotent; no-op on absent keys") {
    val dir = tmpDir("dv-basic")
    mkTable(dir)
    val before = mtimes(dir)
    val victims = (1L to 1000L by 97).toSeq // one per file region, scattered
    val st = MergeTable.deleteKeys(spark, dir, "k", victims)
    assert(st.gen == 1 && st.touched.nonEmpty)
    // data files untouched byte-for-byte (same paths, same mtimes)
    assert(mtimes(dir) == before, "a dv delete rewrote data files")
    assert(keysOf(dir) == (1L to 1000L).toSet -- victims)
    assert(MergeTable.readTable(spark, dir).count() == 1000 - victims.size)
    val Some((_, rows)) = MergeTable.dvInfo(dir, 1): @unchecked
    assert(rows == victims.size)
    // same keys again: already hidden, nothing commits
    assert(MergeTable.deleteKeys(spark, dir, "k", victims).gen == 1)
    // absent keys: stats may admit candidates, but zero hits → no commit
    assert(MergeTable.deleteKeys(spark, dir, "k", Seq(500000L, 600000L)).gen == 1)
    assert(MergeTable.committedGen(dir).contains(1))
    // a second batch GROWS the vector (cumulative)
    assert(MergeTable.deleteKeys(spark, dir, "k", Seq(2L, 3L)).gen == 2)
    assert(keysOf(dir) == (1L to 1000L).toSet -- victims -- Set(2L, 3L))
    assert(MergeTable.dvInfo(dir, 2).exists(_._2 == victims.size + 2))
  }

  test("every read path applies the vector: scanWhere, scanRange, bloom lookup, readIndexed") {
    val dir = tmpDir("dv-reads")
    mkTable(dir)
    MergeTable.buildBloomIndex(spark, dir, "k", numBits = 1 << 14)
    MergeTable.deleteKeys(spark, dir, "k", Seq(100L, 500L, 900L))
    assert(MergeTable.scanWhere(spark, dir, "k", 90L, 110L)
      .select("k").as[Long].collect().toSet == (90L to 110L).toSet - 100L)
    assert(MergeTable.scanRange(spark, dir, "k", 499L, 501L)
      .select("k").as[Long].collect().toSet == Set(499L, 501L))
    // the sidecar still ADMITS the file (sketches are physical) but
    // the residual read hides the row — exact, just unpruned
    assert(MergeTable.scanEqualsBloom(spark, dir, "k", 500L).count() == 0)
    assert(MergeTable.scanEqualsBloom(spark, dir, "k", 501L)
      .select("k").as[Long].collect().toSeq == Seq(501L))
    // Catalyst-integrated read: _metadata resolves through the custom
    // HadoopFsRelation and the anti-join rides above the pruned scan
    assert(MergeTable.readIndexed(spark, dir).filter(col("k") === 900L).count() == 0)
    assert(MergeTable.readIndexed(spark, dir).filter(col("k").between(890, 910))
      .select("k").as[Long].collect().toSet == (890L to 910L).toSet - 900L)
  }

  test("rewriting ops never resurrect: merge prunes entries for its files, compact materializes") {
    val dir = tmpDir("dv-rewrite")
    mkTable(dir)
    MergeTable.deleteKeys(spark, dir, "k", Seq(10L, 11L, 990L))
    // a merge updating a NEIGHBOR key rewrites the low file: its
    // replacement bytes must exclude 10/11, and their vector entries
    // must leave with the file (else a future coincidental row
    // position would hide the wrong row)
    MergeTable.merge(spark, dir,
      Seq((12L, "U", "sX", 9.9)).toDF("k", "op", "seg", "bal"), "k")
    assert(keysOf(dir) == (1L to 1000L).toSet -- Set(10L, 11L, 990L))
    assert(MergeTable.readTable(spark, dir).filter(col("k") === 12L)
      .select("seg").as[String].head() == "sX")
    // the untouched file's entry (990) survives the prune
    assert(MergeTable.dvInfo(dir, 2).exists(_._2 == 1L))
    // full-table compaction materializes: vector gone, rows identical
    val visible = keysOf(dir)
    MergeTable.compact(spark, dir, "k", targetRows = 1000000L)
    assert(MergeTable.dvInfo(dir, MergeTable.committedGen(dir).get).isEmpty,
      "compaction should drain the vector")
    assert(keysOf(dir) == visible)
    // physically gone too: raw file bytes no longer carry the rows
    val raw = MergeTable.manifest(spark, dir).select("path").collect()
      .map(_.getString(0)).toSeq
    assert(spark.read.parquet(raw: _*).filter(col("k").isin(10L, 11L, 990L))
      .count() == 0, "materialization left hidden rows in the bytes")
  }

  test("deleteWhere and updateWhere compose with a live vector") {
    val dir = tmpDir("dv-dml")
    mkTable(dir)
    MergeTable.deleteKeys(spark, dir, "k", Seq(50L, 450L, 850L))
    // band delete: drops whole files (entries leave with them),
    // rewrites the boundary (vector-filtered input)
    MergeTable.deleteWhere(spark, dir, "k", "k", Some(1L), Some(400L))
    assert(keysOf(dir) == (401L to 1000L).toSet -- Set(450L, 850L))
    // banded update must not resurrect 450
    MergeTable.updateWhere(spark, dir, "k", "k", Some(440L), Some(460L),
      Map("bal" -> lit(0.0)))
    assert(keysOf(dir) == (401L to 1000L).toSet -- Set(450L, 850L))
    assert(MergeTable.readTable(spark, dir)
      .filter(col("k").between(440, 460) && col("bal") =!= 0.0).count() == 0)
  }

  test("CDC: the span's hidden rows surface as D from the manifest+vector diff alone") {
    val dir = tmpDir("dv-cdc")
    mkTable(dir)
    MergeTable.deleteKeys(spark, dir, "k", Seq(7L, 700L))
    val d1 = MergeTable.changesBetween(spark, dir, 0, 1, "k")
    assert(d1.select("change_op").distinct().as[String].collect().toSeq == Seq("D"))
    assert(d1.select("k").as[Long].collect().toSet == Set(7L, 700L))
    // pre-images ride the D rows (what a delta-maintained view retracts)
    val pre = MergeTable.changesBetween(spark, dir, 0, 1, "k", preImages = true)
    assert(pre.filter(col("k") === 700L).select("bal").as[Double].head() == 1050.0)
    // a span crossing dv + merge nets correctly
    MergeTable.merge(spark, dir,
      Seq((7L, "I", "back", 1.0)).toDF("k", "op", "seg", "bal"), "k")
    val span = MergeTable.changesBetween(spark, dir, 0, 2, "k")
    val byOp = span.groupBy("change_op").count().as[(String, Long)].collect().toMap
    // 7 deleted-then-reinserted nets to U (value changed); 700 nets to D
    assert(span.filter(col("k") === 700L).select("change_op").as[String].head() == "D")
    assert(span.filter(col("k") === 7L).select("change_op").as[String].head() == "U")
    assert(byOp.values.sum == 2, s"net diff leaked rows: $byOp")
  }

  test("incremental view refresh folds a dvdelete exactly") {
    val store = tmpDir("dv-mv-src")
    val mv = tmpDir("dv-mv") + "/v"
    mkTable(store)
    IncrementalView.materialize(spark, store, "k", mv,
      IncrementalView.ViewSpec(Seq("seg"),
        Seq("cents" -> "cast(round(bal * 100) as decimal(38,0))")))
    MergeTable.deleteKeys(spark, store, "k", Seq(4L, 8L, 400L))
    assert(IncrementalView.refresh(spark, store, mv).contains(1))
    val gotFull = MergeTable.readTable(spark, mv)
      .select(col("seg"), struct(col("mv_count"), col("cents").cast("long")))
      .as[(String, (Long, Long))].collect().toMap
    val wantFull = MergeTable.readTable(spark, store)
      .groupBy("seg").agg(count(lit(1)).as("n"),
        sum(expr("cast(round(bal * 100) as decimal(38,0))")).cast("long").as("c"))
      .select(col("seg"), struct(col("n"), col("c")))
      .as[(String, (Long, Long))].collect().toMap
    assert(gotFull == wantFull, s"view drifted: $gotFull vs $wantFull")
  }

  test("time travel, restore and clone see the vector as part of the generation") {
    val dir = tmpDir("dv-travel")
    mkTable(dir)
    MergeTable.deleteKeys(spark, dir, "k", Seq(123L))
    // pre-vector generation still shows the row
    assert(MergeTable.readTable(spark, dir, asOf = Some(0))
      .filter(col("k") === 123L).count() == 1)
    // restore BACK to gen 0 resurrects (no vector there)
    MergeTable.restore(spark, dir, 0)
    assert(keysOf(dir).contains(123L))
    // restore FORWARD to the vector generation re-hides (dv carried)
    MergeTable.restore(spark, dir, 1)
    assert(!keysOf(dir).contains(123L))
    // a clone cut from the vector generation hides too, and diverges
    val clone = dir + "-c"
    graft.IndexLifecycle.deleteRecursively(clone)
    MergeTable.cloneTable(spark, dir, clone)
    assert(!keysOf(clone).contains(123L))
    MergeTable.deleteKeys(spark, clone, "k", Seq(456L))
    assert(!keysOf(clone).contains(456L))
    assert(keysOf(dir).contains(456L), "clone delete leaked to the source")
  }

  test("the streaming CDC source delivers a dvdelete generation as a D micro-batch") {
    val dir = tmpDir("dv-stream")
    mkTable(dir, n = 100, files = 2)
    val ckpt = tmpDir("dv-stream-ckpt")
    val seen = new scala.collection.mutable.ArrayBuffer[(Long, String, Long)]
    val q = MergeTable.changesStream(spark, dir, "k")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (delta: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = delta.collect().map(r => (r.getAs[Long]("k"),
          r.getAs[String]("change_op"), r.getAs[Long]("_commit_gen")))
        seen.synchronized { seen ++= rows }; ()
      }.start()
    try {
      MergeTable.deleteKeys(spark, dir, "k", Seq(42L, 77L))
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) ==
        Set((42L, "D", 1L), (77L, "D", 1L)), seen.toString)
      // the feed keeps flowing across the vector commit
      MergeTable.merge(spark, dir,
        Seq((500L, "I", "s1", 1.0)).toDF("k", "op", "seg", "bal"), "k")
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet).contains((500L, "I", 2L)))
    } finally q.stop()
  }

  test("CDC across a restore: equal-count different-position vectors still diff exactly") {
    // g1 hides key 5; g2 restores to g0 (5 back, vector gone); g3
    // hides key 7. The span 1→3 has IDENTICAL per-path entry COUNTS
    // on both ends (1 and 1) — only the exact symmetric difference
    // sees the change. A count-based shortcut returns an empty diff
    // and silently drifts every replica crossing the span.
    val dir = tmpDir("dv-restore-cdc")
    mkTable(dir, n = 100, files = 1) // one file: counts collide for sure
    MergeTable.deleteKeys(spark, dir, "k", Seq(5L))
    MergeTable.restore(spark, dir, 0)
    MergeTable.deleteKeys(spark, dir, "k", Seq(7L))
    val span = MergeTable.changesBetween(spark, dir, 1, 3, "k")
    val got = span.select("k", "change_op").as[(Long, String)].collect().toSet
    assert(got == Set((5L, "I"), (7L, "D")), s"span missed vector changes: $got")
  }

  test("deleteKeys resolves the key column by name; ambiguous frames refuse") {
    val dir = tmpDir("dv-keyframe")
    mkTable(dir, n = 100, files = 2)
    // multi-column frame, key NOT first: must hide by the 'k' column
    val frame = Seq((999L, 10L), (998L, 20L)).toDF("other", "k")
    MergeTable.deleteKeys(spark, dir, "k", frame)
    assert(keysOf(dir) == (1L to 100L).toSet -- Set(10L, 20L))
    val e = intercept[IllegalArgumentException] {
      MergeTable.deleteKeys(spark, dir, "k",
        Seq((1L, 2L)).toDF("a", "b"))
    }
    assert(e.getMessage.contains("single-column"), e.getMessage)
  }

  test("a table keyed by a column named 'path' or 'pos' still vector-deletes") {
    val dir = tmpDir("dv-pathkey")
    MergeTable.write(spark,
      (1 to 100).map(i => (f"doc-$i%03d", i * 1.0)).toDF("path", "w"),
      "path", dir, nFiles = 2)
    MergeTable.deleteKeys(spark, dir, "path", Seq("doc-007", "doc-050"))
    assert(MergeTable.readTable(spark, dir).count() == 98)
    assert(MergeTable.readTable(spark, dir)
      .filter(col("path").isin("doc-007", "doc-050")).count() == 0)
    val dir2 = tmpDir("dv-poskey")
    MergeTable.write(spark,
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("pos", "v"),
      "pos", dir2, nFiles = 2)
    MergeTable.deleteKeys(spark, dir2, "pos", Seq(9L))
    assert(MergeTable.readTable(spark, dir2).count() == 99)
  }

  test("a z-clustered layout vector-deletes exactly (weak key pruning, every file a candidate)") {
    val dir = tmpDir("dv-zorder")
    MergeTable.writeClustered(spark,
      (1 to 1000).map(k => (k.toLong, (k % 97).toLong, k * 1.5))
        .toDF("k", "x", "bal"),
      "k", Seq("k", "x"), dir, nFiles = 8)
    // z-order spreads key ranges across files: the stats prune admits
    // most/all files, and correctness must not depend on selectivity
    MergeTable.deleteKeys(spark, dir, "k", Seq(13L, 500L, 987L))
    assert(keysOf(dir) == (1L to 1000L).toSet -- Set(13L, 500L, 987L))
    // partial recluster (vector-filtered fold) never resurrects
    MergeTable.merge(spark, dir,
      Seq((20L, "U", 3L, 0.1)).toDF("k", "op", "x", "bal"), "k")
    MergeTable.reclusterPartial(spark, dir, "k", Seq("k", "x"))
    assert(keysOf(dir) == (1L to 1000L).toSet -- Set(13L, 500L, 987L))
  }

  test("racing deleteKeys writers: CAS losers retry, both batches land, vector is the union") {
    val dir = tmpDir("dv-race")
    mkTable(dir)
    val batches = Seq(
      (1L to 1000L by 101).toSeq,   // writer 1's victims
      (2L to 1000L by 103).toSeq,   // writer 2's
      (3L to 1000L by 107).toSeq)   // writer 3's
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val futs = batches.map { ks =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var ok = false
          while (!ok) {
            try { MergeTable.deleteKeys(spark, dir, "k", ks); ok = true }
            catch { case _: java.util.ConcurrentModificationException => () }
          }
        }
      })
    }
    try futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    finally pool.shutdown()
    val victims = batches.flatten.toSet
    assert(keysOf(dir) == (1L to 1000L).toSet -- victims,
      "a lost-then-retried vector batch dropped or duplicated hides")
    assert(MergeTable.committedGen(dir).contains(3))
    assert(MergeTable.dvInfo(dir, 3).exists(_._2 == victims.size))
    // losers' staged vector dirs were cleaned: exactly the current
    // generation's referenced SEGMENTS survive vacuum (one per
    // committed dvdelete), nothing else
    MergeTable.vacuum(spark, dir)
    val dvs = {
      val ls = java.nio.file.Files.list(java.nio.file.Path.of(dir))
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("dv-g")).toSeq
      } finally ls.close()
    }
    assert(dvs.toSet == MergeTable.dvSegments(dir, 3).toSet && dvs.size == 3,
      s"stale vector staging survived (or referenced segments swept): $dvs")
    assert(keysOf(dir) == (1L to 1000L).toSet -- victims)
  }

  test("vacuum keeps referenced segments, sweeps drained ones, reads stay exact") {
    val dir = tmpDir("dv-vac")
    mkTable(dir)
    MergeTable.deleteKeys(spark, dir, "k", Seq(1L, 2L))
    MergeTable.deleteKeys(spark, dir, "k", Seq(3L))
    def dvDirs(): Seq[String] = {
      val ls = java.nio.file.Files.list(java.nio.file.Path.of(dir))
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("dv-g")).toSeq.sorted
      } finally ls.close()
    }
    // two dvdelete commits = two segments, and generation 1's travel
    // reads through its one-segment prefix of the list
    assert(dvDirs().size == 2)
    assert(MergeTable.readTable(spark, dir, asOf = Some(1)).count() == 998)
    // the CURRENT generation references BOTH segments, so vacuum
    // keeps both (old-generation MANIFESTS still sweep, as ever —
    // segment retention follows references, not time travel)
    MergeTable.vacuum(spark, dir)
    assert(dvDirs().size == 2, s"referenced segment swept: ${dvDirs()}")
    assert(keysOf(dir) == (4L to 1000L).toSet)
    // compaction materializes the vector into the data bytes; the
    // drained segments lose their last reference and vacuum sweeps
    // them, after which vector-generation travel ends loudly
    MergeTable.compact(spark, dir, "k", targetRows = 1000000L)
    MergeTable.vacuum(spark, dir)
    assert(dvDirs().isEmpty, s"drained segments survived: ${dvDirs()}")
    assert(keysOf(dir) == (4L to 1000L).toSet)
    val e = intercept[IllegalArgumentException] {
      MergeTable.readTable(spark, dir, asOf = Some(1)).count()
    }
    assert(e.getMessage.contains("deletion-vector") ||
      e.getMessage.contains("manifest"), e.getMessage)
  }

  test("segments: each dvdelete writes only its batch; the cap rolls them up") {
    val dir = tmpDir("dv-segs")
    mkTable(dir, n = 500, files = 4)
    val cap = MergeTable.dvSegmentCap
    // cap commits of one key each: the list grows one BATCH-SIZED
    // segment per commit — the r11 design rewrote the cumulative
    // vector here, O(total hidden) per commit
    (1 to cap).foreach { i =>
      MergeTable.deleteKeys(spark, dir, "k", Seq(i.toLong))
      val segs = MergeTable.dvSegments(dir, i)
      assert(segs.size == i, s"commit $i: expected $i segments, got $segs")
      // the NEWEST segment holds exactly this commit's hits
      assert(spark.read.parquet(s"$dir/${segs.last}").count() == 1,
        s"commit $i wrote more than its batch")
      assert(MergeTable.dvInfo(dir, i).exists(_._2 == i.toLong))
    }
    // the cap'th+1 delete rolls everything into ONE merged segment
    MergeTable.deleteKeys(spark, dir, "k", Seq((cap + 1).toLong))
    val rolled = MergeTable.dvSegments(dir, cap + 1)
    assert(rolled.size == 1, s"cap rollup didn't collapse: $rolled")
    assert(spark.read.parquet(s"$dir/${rolled.head}").count() == cap + 1L)
    assert(MergeTable.dvInfo(dir, cap + 1).exists(_._2 == cap + 1L))
    assert(keysOf(dir) == (1L to 500L).toSet -- (1L to (cap + 1L)))
    // reads mid-diet were exact all along (spot-check a travel)
    assert(MergeTable.readTable(spark, dir, asOf = Some(2)).count() == 498)
  }

  test("a real column named _metadata refuses the position scan loudly") {
    val dir = tmpDir("dv-metacol")
    MergeTable.write(spark,
      (1 to 50).map(i => (i.toLong, s"m$i")).toDF("k", "_metadata"),
      "k", dir, nFiles = 2)
    val e = intercept[IllegalArgumentException] {
      MergeTable.deleteKeys(spark, dir, "k", Seq(7L))
    }
    assert(e.getMessage.contains("_metadata"), e.getMessage)
    // the table is untouched — no half-committed vector
    assert(MergeTable.committedGen(dir).contains(0))
    assert(MergeTable.readTable(spark, dir).count() == 50)
  }
}
