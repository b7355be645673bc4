package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** File-pruned MERGE (q59 machinery): pruning soundness, by-reference
  * carry of untouched files, commit atomicity, crash replay.
  */
class MergeTableSpec extends SparkSpecBase {
  import java.nio.file.{Files, Path}
  import scala.jdk.CollectionConverters._

  private def mtimesOf(paths: Seq[String]): Map[String, Long] =
    paths.map(p => p -> Files.getLastModifiedTime(
      Path.of(java.net.URI.create(p))).toMillis).toMap

  /** The executed plan's FileSourceScanExec (unwrapping AQE) — the
    * numFiles-metric hook the pushdown tests share. Execute the frame
    * (collect) BEFORE reading metrics off it.
    */
  private def scanOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.FileSourceScanExec = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def find(p: SparkPlan): Option[FileSourceScanExec] =
      p.collectFirst { case f: FileSourceScanExec => f }
        .orElse(p.collectFirst { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => find(a.executedPlan)))
    find(df.queryExecution.executedPlan).getOrElse(
      fail("no FileSourceScanExec in plan"))
  }

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
      Seq(10L, 20L, 30L).exists(k => k >= r.getAs[Long]("min_k") && k <= r.getAs[Long]("max_k")))
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

  test("append: non-unique keys accumulate, files carry by reference, empty batch is a no-op") {
    import spark.implicits._
    val dir = tmpDir("mergetab-append")
    val facts = (1 to 100).map(k => (k.toLong % 10, s"v$k")).toDF("k", "v")
    MergeTable.write(spark, facts, "k", dir, nFiles = 2)
    val paths0 = MergeTable.manifest(spark, dir).collect().map(_.getString(0)).toSeq
    val mt0 = mtimesOf(paths0)
    // append a batch sharing EVERY key — rows accumulate (facts, not
    // upserts: the shape merge's key overlay must never be used for)
    val g1 = MergeTable.append(spark, dir,
      (1 to 50).map(k => (k.toLong % 10, s"w$k")).toDF("k", "v"), "k")
    assert(g1 == 1 && MergeTable.committedGen(dir).contains(1))
    assert(MergeTable.readTable(spark, dir).count() == 150,
      "append must accumulate, never overlay")
    // prior files carried by reference, bytes untouched
    val man1 = MergeTable.manifest(spark, dir).collect().map(_.getString(0)).toSeq
    assert(paths0.toSet.subsetOf(man1.toSet), "append dropped carried files")
    assert(mtimesOf(paths0) == mt0, "append rewrote carried bytes")
    // an empty batch commits nothing — generations advance only when
    // bytes landed
    val g2 = MergeTable.append(spark, dir,
      facts.filter(lit(false)), "k")
    assert(g2 == 1 && MergeTable.committedGen(dir).contains(1),
      "empty append minted a generation")
    // stats flow: the appended files prune like any others
    assert(MergeTable.scanWhere(spark, dir, "k", 3L, 3L)
      .count() == MergeTable.readTable(spark, dir)
      .filter(col("k") === 3L).count())
  }

  test("append enforces constraints and evolves schema like every other commit") {
    import spark.implicits._
    val dir = tmpDir("mergetab-append-gov")
    MergeTable.write(spark, table(50), "k", dir, nFiles = 1)
    MergeTable.addCheckConstraint(spark, dir, "bal-positive", "bal > 0")
    val gen0 = MergeTable.committedGen(dir).get
    // a violating batch is refused BEFORE the commit — no generation
    // minted, no rows leaked
    intercept[IllegalStateException] {
      MergeTable.append(spark, dir,
        Seq((500L, "bad", -1.0)).toDF("k", "seg", "bal"), "k")
    }
    assert(MergeTable.committedGen(dir).contains(gen0),
      "a refused append minted a generation")
    assert(MergeTable.readTable(spark, dir).filter(col("k") === 500L).isEmpty)
    // schema evolution: a batch with a NEW column appends; carried
    // files surface it as null under the evolved log schema
    MergeTable.append(spark, dir,
      Seq((600L, "ok", 2.0, "extra")).toDF("k", "seg", "bal", "note"), "k")
    val t = MergeTable.readTable(spark, dir)
    assert(t.columns.contains("note"))
    assert(t.filter(col("k") === 600L).select("note").as[String].head() == "extra")
    assert(t.filter(col("k") === 1L).select("note").isEmpty ||
      t.filter(col("k") === 1L).select("note").as[String].head() == null,
      "carried files must surface the evolved column as null")
  }

  test("append inherits standing deletion vectors; a pure-append CDC span is all-I") {
    import spark.implicits._
    val dir = tmpDir("mergetab-append-dv")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    // hide rows 1..5 behind a deletion vector (no byte rewrite)
    MergeTable.deleteKeys(spark, dir, "k", (1L to 5L).map(_.asInstanceOf[Any]))
    val gDv = MergeTable.committedGen(dir).get
    assert(MergeTable.readTable(spark, dir).count() == 95)
    // append new rows: the DV meta must ride forward — appended rows
    // visible, vector-hidden rows STAY hidden (an append that dropped
    // the vector pointer would silently resurrect them)
    MergeTable.append(spark, dir,
      (200 to 204).map(k => (k.toLong, "new", 0.0)).toDF("k", "seg", "bal"), "k")
    val after = MergeTable.readTable(spark, dir)
    assert(after.count() == 100)
    assert(after.filter(col("k") <= 5L).isEmpty,
      "append resurrected vector-hidden rows")
    assert(after.filter(col("k") >= 200L).count() == 5)
    // the append span's CDC feed: exactly the 5 inserts, nothing else
    // (the old side is empty, so non-unique keys would also be safe
    // here — the boundary documented on append)
    val feed = MergeTable.changesBetween(spark, dir, gDv,
      MergeTable.committedGen(dir).get, "k")
      .select("change_op", "k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(feed.sorted.toSeq == (200L to 204L).map(("I", _)).toSeq,
      s"pure-append span not all-I: ${feed.toSeq}")
  }

  test("rewriteAll: whole-set transform commits through the log; a racing commit aborts it") {
    import spark.implicits._
    val dir = tmpDir("mergetab-rewrite")
    val facts = (1 to 100).map(k => (k.toLong % 10, k.toLong)).toDF("k", "n")
    MergeTable.write(spark, facts, "k", dir, nFiles = 2)
    val g1 = MergeTable.rewriteAll(spark, dir, "k",
      df => df.filter(col("n") % 2 === 0))
    assert(g1 == 1)
    assert(MergeTable.readTable(spark, dir).count() == 50)
    // time travel still reads the pre-rewrite generation
    assert(MergeTable.readTable(spark, dir, asOf = Some(0)).count() == 100)
    // a commit racing the rewrite makes it lose its CAS — the caller
    // re-runs against the new head (its staged output read a
    // superseded snapshot); simulate by committing between the
    // rewrite's read and its commit via the transform hook
    val boom = intercept[java.util.ConcurrentModificationException] {
      MergeTable.rewriteAll(spark, dir, "k", { df =>
        MergeTable.append(spark, dir,
          Seq((0L, 777L)).toDF("k", "n"), "k")
        df.filter(col("n") =!= 777L)
      })
    }
    assert(boom.getMessage.contains("committed by a concurrent writer"))
    // the racer's row is intact; the lost rewrite left no trace
    assert(MergeTable.readTable(spark, dir).filter(col("n") === 777L).count() == 1,
      "the winning append's row must survive the lost rewrite")
    val retry = MergeTable.rewriteAll(spark, dir, "k",
      df => df.filter(col("n") =!= 777L))
    assert(retry == 3 && MergeTable.readTable(spark, dir)
      .filter(col("n") === 777L).isEmpty)
  }

  test("rewriteFiles: subset rewrite carries the rest by reference; retired inputs are a lost race") {
    import spark.implicits._
    val dir = tmpDir("mergetab-rwfiles")
    MergeTable.write(spark, (1 to 100).map(k => (k.toLong, k.toLong))
      .toDF("k", "n"), "k", dir, nFiles = 4)
    val man0 = MergeTable.manifest(spark, dir)
      .select("path", "min_k", "max_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val target = man0.minBy(_._2) // the lowest-key file
    val others = man0.filterNot(_._1 == target._1).map(_._1).toSeq
    val mt0 = mtimesOf(others)
    MergeTable.rewriteFiles(spark, dir, "k", Seq(target._1),
      df => df.filter(col("k") % 2 === 0))
    // dropped exactly the target file's odd keys; everything else intact
    val want = (1 to 100).map(_.toLong)
      .filterNot(k => k >= target._2 && k <= target._3 && k % 2 == 1).sorted
    assert(MergeTable.readTable(spark, dir).select("k").as[Long]
      .collect().sorted.toSeq == want)
    // untouched files carried by reference, bytes untouched
    val man1 = MergeTable.manifest(spark, dir).collect().map(_.getString(0)).toSet
    assert(others.forall(man1.contains), "rewriteFiles dropped a carried file")
    assert(mtimesOf(others) == mt0, "rewriteFiles rewrote carried bytes")
    // the RETIRED input path is no longer a live file — a caller whose
    // discovery predates a concurrent commit must read it as a lost
    // race (re-discover), never as a silent no-op or a wrong rewrite
    intercept[java.util.ConcurrentModificationException] {
      MergeTable.rewriteFiles(spark, dir, "k", Seq(target._1), identity)
    }
  }

  test("null keys are refused at every write gate (they have no row identity)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-nullkey")
    // gen-0 write: the inline assert_true guard throws mid-scan
    val bad = Seq((Some(1L), "a"), (None: Option[Long], "b"))
      .toDF("k", "seg")
    val e1 = intercept[Exception] {
      MergeTable.write(spark, bad, "k", dir, nFiles = 2)
    }
    assert(String.valueOf(e1.getMessage).contains("null value in key column") ||
      Option(e1.getCause).exists(c => String.valueOf(c.getMessage)
        .contains("null value in key column")), s"wrong error: $e1")
    // a clean table, then a null-key merge batch: refused before any
    // staging lands, generation unchanged
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    val changes = Seq((Option(10L), "U", "WEB", 1.0),
      (None: Option[Long], "I", "NEW", 2.0)).toDF("k", "op", "seg", "bal")
    val e2 = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir, changes, "k")
    }
    assert(e2.getMessage.contains("null"), s"wrong error: $e2")
    assert(MergeTable.committedGen(dir).contains(0),
      "refused merge advanced the generation")
    assert(MergeTable.readTable(spark, dir).count() == 100)
  }

  test("crash replay: orphaned staging is invisible, swept by vacuum, committed gen intact") {
    import spark.implicits._
    val dir = tmpDir("mergetab-crash")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 4)
    val before = MergeTable.readTable(spark, dir).count()
    // simulate a predecessor that died mid-merge: token-suffixed
    // staging dirs and a staged log entry exist, the commit link never
    // landed
    Files.createDirectories(Path.of(dir, "files-g1~deadtok"))
    Files.write(Path.of(dir, "files-g1~deadtok", "garbage.parquet"), Array[Byte](1, 2, 3))
    Files.createDirectories(Path.of(dir, "manifest-g1~deadtok"))
    Files.write(Path.of(dir, "_commit.tmp-deadtok"), "token=deadtok\n".getBytes)
    assert(MergeTable.committedGen(dir).contains(0), "crash leaked a commit")
    assert(MergeTable.readTable(spark, dir).count() == before,
      "reader saw uncommitted files")
    // replay merges cleanly beside the wreckage (fresh token, no clash)
    val changes = Seq((1L, "D", null, 0.0)).toDF("k", "op", "seg", "bal")
    MergeTable.merge(spark, dir, changes, "k")
    assert(MergeTable.committedGen(dir).contains(1))
    assert(MergeTable.readTable(spark, dir).count() == before - 1)
    assert(MergeTable.readTable(spark, dir).filter(col("k") === 1L).isEmpty)
    // vacuum sweeps the dead writer's staging
    MergeTable.vacuum(spark, dir)
    assert(!Files.exists(Path.of(dir, "files-g1~deadtok")), "dead staging survived vacuum")
    assert(!Files.exists(Path.of(dir, "manifest-g1~deadtok")), "dead manifest survived vacuum")
    assert(!Files.exists(Path.of(dir, "_commit.tmp-deadtok")), "dead log entry survived vacuum")
    assert(MergeTable.readTable(spark, dir).count() == before - 1)
  }

  test("concurrent merges: commit is a CAS — every writer's update lands exactly once") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("mergetab-occ")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    val writers = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (1 to writers).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          val change = Seq((i.toLong, "U", "WEB", i * 100.0)).toDF("k", "op", "seg", "bal")
          var done = false
          var tries = 0
          while (!done && tries < 50) {
            tries += 1
            try { MergeTable.merge(spark, dir, change, "k"); done = true }
            catch { case _: java.util.ConcurrentModificationException =>
              conflicts.incrementAndGet() } // stale base: recompute + retry
          }
          if (!done) failures.add(new IllegalStateException(s"writer $i starved"))
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty,
      s"concurrent writers failed: ${failures.asScala.map(_.toString).toSeq}")
    // every successful commit took exactly one generation: no lost
    // updates, no double-applies
    assert(MergeTable.committedGen(dir).contains(writers),
      s"$writers commits must advance $writers generations, " +
        s"got ${MergeTable.committedGen(dir)} (conflicts seen: ${conflicts.get})")
    val t = MergeTable.readTable(spark, dir)
    (1 to writers).foreach { i =>
      assert(t.filter(col("k") === i.toLong).select("seg", "bal")
        .as[(String, Double)].head() == ("WEB", i * 100.0), s"writer $i's update lost")
    }
    assert(t.count() == 100)
    // losers' abandoned staging never becomes visible; vacuum clears it
    MergeTable.vacuum(spark, dir)
    assert(MergeTable.readTable(spark, dir).count() == 100)
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

  test("vacuum aborts LOUDLY when the current generation's anchor is damaged") {
    import spark.implicits._
    // a best-effort read of the CURRENT manifest would silently empty
    // the live set and the sweep would delete every live data file —
    // both damage modes must abort before anything is swept
    val dir = tmpDir("mergetab-vacguard")
    MergeTable.write(spark,
      (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("k", "bal"), "k", dir, nFiles = 2)
    val dataBefore = MergeTable.readTable(spark, dir).count()
    // damage 1: current manifest dir missing
    val tok = MergeTable.committedMeta(dir)("token")
    val manDir = Path.of(dir, s"manifest-g0~$tok")
    val saved = Path.of(dir, "saved-manifest")
    Files.move(manDir, saved)
    val e1 = intercept[Exception] { MergeTable.vacuum(spark, dir) }
    assert(e1.getMessage.contains("manifest"), e1.getMessage)
    Files.move(saved, manDir)
    // damage 2: token-less current commit entry
    val marker = Path.of(dir, "_log", "_commit-g0")
    val body = new String(Files.readAllBytes(marker), "UTF-8")
    Files.write(marker, body.linesIterator.filterNot(_.startsWith("token="))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    val e2 = intercept[Exception] { MergeTable.vacuum(spark, dir) }
    assert(e2.getMessage.contains("token"), e2.getMessage)
    Files.write(marker, body.getBytes("UTF-8"))
    // nothing was swept by the aborted attempts
    assert(MergeTable.readTable(spark, dir).count() == dataBefore)
    assert(MergeTable.vacuum(spark, dir) >= 0) // healthy again
  }

  test("vacuum drops only unreferenced files; committed table reads identically") {
    import spark.implicits._
    val dir = tmpDir("mergetab-vacuum")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val stats = MergeTable.merge(spark, dir,
      Seq((10L, "U", "WEB", 1.0), (990L, "D", null: String, 0.0))
        .toDF("k", "op", "seg", "bal"), "k")
    // plus a crashed-commit artifact vacuum should sweep
    Files.write(Path.of(dir, "_commit.tmp-stale9"), "token=stale9\n".getBytes)
    val before = MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq
    val deleted = MergeTable.vacuum(spark, dir)
    assert(deleted > 0, "vacuum found nothing despite superseded files")
    // superseded gen-0 files and the old manifest are gone...
    stats.touched.foreach(p =>
      assert(!Files.exists(Path.of(java.net.URI.create(p))), s"superseded $p survived"))
    val manifestDirs = {
      val ls = Files.list(Path.of(dir))
      try ls.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("manifest-g")).toSeq
      finally ls.close()
    }
    assert(manifestDirs.size == 1, s"old manifests survived: $manifestDirs")
    assert(!Files.exists(Path.of(dir, "_commit.tmp-stale9")), "stale log entry survived")
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

  test("vacuum retention spares recent files (the concurrent-writer window)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-retention")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    MergeTable.merge(spark, dir,
      Seq((1L, "U", "WEB", 1.0)).toDF("k", "op", "seg", "bal"), "k")
    // everything here was just written: a retention-respecting vacuum
    // must delete NOTHING (this is what protects an in-flight
    // writer's fresh staging and commit from a racing vacuum)
    assert(MergeTable.vacuum(spark, dir, minAgeMs = 3600 * 1000L) == 0,
      "retention vacuum deleted recent files")
    assert(MergeTable.manifestAt(spark, dir, 0).count() > 0,
      "old generation should survive a retention vacuum")
    // with retention waived, the same sweep reclaims the old gen
    assert(MergeTable.vacuum(spark, dir) > 0)
  }

  test("time travel: asOf reads any committed generation until vacuum") {
    import spark.implicits._
    val dir = tmpDir("mergetab-travel")
    MergeTable.write(spark, table(200), "k", dir, nFiles = 4)
    val gen0 = MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq
    MergeTable.merge(spark, dir,
      Seq((5L, "U", "WEB", 1.0), (6L, "D", null: String, 0.0))
        .toDF("k", "op", "seg", "bal"), "k")
    // asOf 0 reproduces the pre-merge snapshot exactly; asOf 1 ≡ current
    assert(MergeTable.readTable(spark, dir, asOf = Some(0))
      .as[(Long, String, Double)].collect().sorted.toSeq == gen0)
    assert(MergeTable.readTable(spark, dir, asOf = Some(1))
      .as[(Long, String, Double)].collect().sorted.toSeq ==
      MergeTable.readTable(spark, dir)
        .as[(Long, String, Double)].collect().sorted.toSeq)
    // an uncommitted future generation is not readable even if a
    // crashed merge left its manifest dir behind
    Files.createDirectories(Path.of(dir, "manifest-g2"))
    intercept[IllegalArgumentException] {
      MergeTable.readTable(spark, dir, asOf = Some(2))
    }
    // vacuum ends time travel with a clear error, not wrong rows
    MergeTable.vacuum(spark, dir)
    val e = intercept[IllegalArgumentException] {
      MergeTable.readTable(spark, dir, asOf = Some(0))
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("CDC: file-diff changes reproduce the logical delta, carried files never opened") {
    import spark.implicits._
    val dir = tmpDir("mergetab-cdc")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val stats = MergeTable.merge(spark, dir, Seq(
      (10L, "U", "WEB", 999.0), (20L, "U", "WEB", 999.0),
      (30L, "D", null, 0.0),
      (5000L, "I", "NEW", 1.0)
    ).toDF("k", "op", "seg", "bal"), "k")
    assert(stats.untouched.nonEmpty)
    // a carried file is REMOVED from disk: the CDC read must not
    // notice, because both manifests reference it and the diff skips
    // common paths before opening anything
    val victim = Path.of(java.net.URI.create(stats.untouched.head))
    val bytes = Files.readAllBytes(victim)
    Files.delete(victim)
    try {
      val got = MergeTable.changesBetween(spark, dir, 0, 1, "k")
        .select("k", "change_op", "seg", "bal")
        .as[(Long, String, String, Double)].collect().sorted.toSeq
      val want = Seq(
        (10L, "U", "WEB", 999.0), (20L, "U", "WEB", 999.0),
        (30L, "D", "seg2", 30 * 1.5), // pre-image on the delete
        (5000L, "I", "NEW", 1.0)).sorted
      assert(got == want, s"CDC delta diverged: $got")
    } finally Files.write(victim, bytes) // restore for any later reads
    // unchanged residents of the REWRITTEN files are not in the delta
    // (they round-trip byte-different but value-identical)
  }

  test("CDC: a multi-generation span yields the NET logical delta") {
    import spark.implicits._
    val dir = tmpDir("mergetab-cdc2")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    MergeTable.merge(spark, dir, Seq(
      (7L, "U", "WEB", 1.0),            // updated twice across the span
      (9000L, "I", "TMP", 1.0)          // inserted then deleted: nets out
    ).toDF("k", "op", "seg", "bal"), "k")
    MergeTable.merge(spark, dir, Seq(
      (7L, "U", "WEB", 2.0),
      (9000L, "D", null, 0.0)
    ).toDF("k", "op", "seg", "bal"), "k")
    val got = MergeTable.changesBetween(spark, dir, 0, 2, "k")
      .select("k", "change_op", "seg", "bal")
      .as[(Long, String, String, Double)].collect().sorted.toSeq
    assert(got == Seq((7L, "U", "WEB", 2.0)),
      s"net delta should be the final update only: $got")
    // each single hop still sees its own physical step
    assert(MergeTable.changesBetween(spark, dir, 1, 2, "k")
      .filter(col("k") === 9000L).select("change_op")
      .as[String].collect().toSeq == Seq("D"))
  }

  test("compact folds small files, carries full ones by reference, no-ops when nothing to gain") {
    import spark.implicits._
    val dir = tmpDir("mergetab-compact")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 4) // 250 rows/file
    // two insert-only merges strew two tiny files across generations
    MergeTable.merge(spark, dir, (1 to 10).map(i => (5000L + i, "I", "NEW", 1.0))
      .toDF("k", "op", "seg", "bal"), "k")
    MergeTable.merge(spark, dir, (1 to 10).map(i => (6000L + i, "I", "NEW", 1.0))
      .toDF("k", "op", "seg", "bal"), "k")
    val before = MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq
    val man2 = MergeTable.manifest(spark, dir).collect()
    assert(man2.length == 6, s"expected 4 big + 2 tiny files: ${man2.length}")
    val bigPaths = man2.filter(_.getAs[Long]("n_rows") >= 50).map(_.getString(0)).toSeq
    val mt = mtimesOf(bigPaths)

    val stats = MergeTable.compact(spark, dir, "k", targetRows = 50)
    assert(stats.gen == 3)
    assert(stats.touched.size == 2, s"should fold exactly the 2 tiny files: $stats")
    assert(stats.untouched.toSet == bigPaths.toSet)
    val man3 = MergeTable.manifest(spark, dir).collect()
    assert(man3.length == 5, s"2 tiny files should fold into 1: ${man3.length}")
    bigPaths.foreach(p => assert(mtimesOf(Seq(p))(p) == mt(p), s"full file $p rewritten"))
    assert(MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq == before,
      "compaction changed the table's rows")
    // idempotent: nothing left under target → no new generation
    assert(MergeTable.compact(spark, dir, "k", targetRows = 50).gen == 3)
    assert(MergeTable.committedGen(dir).contains(3))
  }

  test("upsertSink: idempotent foreachBatch — replayed batches are no-ops") {
    import spark.implicits._
    val dir = tmpDir("mergetab-sink")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    val sink = MergeTable.upsertSink(dir, "k")
    val b0 = Seq((1L, "U", "WEB", 10.0)).toDF("k", "op", "seg", "bal")
    val b1 = Seq((2L, "D", null: String, 0.0),
      (9000L, "I", "NEW", 5.0)).toDF("k", "op", "seg", "bal")
    sink(b0, 0L); sink(b1, 1L)
    val after = MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(MergeTable.committedGen(dir).contains(2))
    assert(MergeTable.committedMeta(dir).get("batch").contains("1"))
    // a restarted query re-offers both batches: no generation moves,
    // no rows change
    sink(b0, 0L); sink(b1, 1L)
    assert(MergeTable.committedGen(dir).contains(2), "replay advanced the table")
    assert(MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq == after)
    // a genuinely new batch still applies
    sink(Seq((3L, "U", "WEB", 30.0)).toDF("k", "op", "seg", "bal"), 2L)
    assert(MergeTable.committedGen(dir).contains(3))
    assert(MergeTable.readTable(spark, dir).filter(col("k") === 3L)
      .select("seg").as[String].head() == "WEB")
  }

  test("upsertSink drives from a real stream and survives a second identical run") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmpDir("mergetab-stream")
    MergeTable.write(spark, table(50), "k", dir, nFiles = 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String, Double)]
    in.addData((10L, "U", "WEB", 77.0), (60000L, "I", "NEW", 1.0))
    val sink = MergeTable.upsertSink(dir, "k")
    val q = in.toDF().toDF("k", "op", "seg", "bal")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) => sink(b, id) }
      .option("checkpointLocation", tmpDir("mergetab-stream-ckpt"))
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val got = MergeTable.readTable(spark, dir)
      .filter(col("k").isin(10L, 60000L))
      .select("k", "seg", "bal").as[(Long, String, Double)].collect().sorted.toSeq
    assert(got == Seq((10L, "WEB", 77.0), (60000L, "NEW", 1.0)), s"stream upsert lost rows: $got")
  }

  test("scanRange opens only manifest-intersecting files; results stay exact") {
    import spark.implicits._
    val dir = tmpDir("mergetab-scan")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val man = MergeTable.manifest(spark, dir).collect()
    // delete every file whose range is fully outside [100, 220]: a
    // pruned scan must not notice they are gone
    val (needed, prunable) = man.partition(r => r.getAs[Long]("max_k") >= 100 && r.getAs[Long]("min_k") <= 220)
    assert(prunable.nonEmpty && needed.length <= 3)
    val saved = prunable.map { r =>
      val p = Path.of(java.net.URI.create(r.getString(0)))
      val b = Files.readAllBytes(p); Files.delete(p); (p, b)
    }
    try {
      val got = MergeTable.scanRange(spark, dir, "k", 100, 220)
        .select("k").as[Long].collect().sorted.toSeq
      assert(got == (100L to 220L).toSeq, s"pruned scan wrong: ${got.size} rows")
    } finally saved.foreach { case (p, b) => Files.write(p, b) }
    // a band beyond every file: empty result, schema intact
    val empty = MergeTable.scanRange(spark, dir, "k", 50000, 60000)
    assert(empty.isEmpty && empty.columns.toSeq == Seq("k", "seg", "bal"))
  }

  test("schema evolution: a batch can add columns and omit existing ones") {
    import spark.implicits._
    val dir = tmpDir("mergetab-evolve")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    // batch ADDS `tier`, OMITS `bal`; touches only the low file
    val changes = Seq(
      (3L, "U", "WEB", "gold"),
      (7000L, "I", "NEW", "silver")
    ).toDF("k", "op", "seg", "tier")
    MergeTable.merge(spark, dir, changes, "k")
    val t = MergeTable.readTable(spark, dir)
    assert(t.columns.sorted.toSeq == Seq("bal", "k", "seg", "tier"))
    // updated row: new column set, omitted bal PRESERVED
    assert(t.filter(col("k") === 3L).select("seg", "bal", "tier")
      .as[(String, Double, String)].head() == ("WEB", 3 * 1.5, "gold"))
    // inserted row: omitted bal null
    val ins = t.filter(col("k") === 7000L).select("seg", "tier").as[(String, String)].head()
    assert(ins == ("NEW", "silver"))
    assert(t.filter(col("k") === 7000L).filter(col("bal").isNull).count() == 1)
    // resident of a REWRITTEN file: tier null, everything else intact
    val touchedResident = t.filter(col("k") === 4L)
      .select("seg", "bal", "tier").as[(String, Double, String)].head()
    assert(touchedResident == ("seg0", 4 * 1.5, null))
    // resident of a CARRIED pre-evolution file: tier surfaces as null
    val carried = t.filter(col("k") === 90L)
      .select("seg", "bal", "tier").as[(String, Double, String)].head()
    assert(carried == (s"seg2", 90 * 1.5, null))
    // CDC across the evolution: the updated row reports U with the
    // new column populated; the pre-evolution pre-image aligns as null
    val cdc = MergeTable.changesBetween(spark, dir, 0, 1, "k")
      .select("k", "change_op", "tier").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(cdc == Seq((3L, "U", "gold"), (7000L, "I", "silver")), s"CDC across evolution: $cdc")
    // a LATER merge omitting `tier` and touching only a PRE-evolution
    // file must not drop the evolved column from the table
    MergeTable.merge(spark, dir,
      Seq((60L, "U", "XXX")).toDF("k", "op", "seg"), "k")
    val t2 = MergeTable.readTable(spark, dir)
    assert(t2.columns.sorted.toSeq == Seq("bal", "k", "seg", "tier"))
    assert(t2.filter(col("k") === 3L).select("tier").as[String].head() == "gold",
      "post-evolution value lost by a later pre-evolution-file rewrite")
    assert(t2.filter(col("k") === 60L).select("seg", "bal", "tier")
      .as[(String, Double, String)].head() == ("XXX", 60 * 1.5, null))
    // schema-in-log: every commit entry records the union schema, so
    // readers never need a footer-merge job and the evolution is
    // visible in the log itself
    assert(MergeTable.schemaAt(dir, 0).get.fieldNames.sorted.toSeq ==
      Seq("bal", "k", "seg"))
    assert(MergeTable.schemaAt(dir, 2).get.fieldNames.sorted.toSeq ==
      Seq("bal", "k", "seg", "tier"))
  }

  test("pollChanges: the consumer cursor sees each commit exactly once") {
    import spark.implicits._
    val dir = tmpDir("mergetab-poll")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    var cursor = 0
    assert(MergeTable.pollChanges(spark, dir, cursor, "k").isEmpty, "nothing committed yet")
    MergeTable.merge(spark, dir,
      Seq((1L, "U", "WEB", 9.0)).toDF("k", "op", "seg", "bal"), "k")
    MergeTable.merge(spark, dir,
      Seq((2L, "D", null: String, 0.0)).toDF("k", "op", "seg", "bal"), "k")
    // one poll nets BOTH commits
    val Some((g, delta)) = MergeTable.pollChanges(spark, dir, cursor, "k")
    assert(g == 2)
    val got = delta.select("k", "change_op").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "U"), (2L, "D")), s"cursor delta wrong: $got")
    cursor = g
    // caught up: no delta, no Spark job
    assert(MergeTable.pollChanges(spark, dir, cursor, "k").isEmpty)
    // next commit shows only its own change
    MergeTable.merge(spark, dir,
      Seq((3L, "U", "XXX", 1.0)).toDF("k", "op", "seg", "bal"), "k")
    val Some((g2, d2)) = MergeTable.pollChanges(spark, dir, cursor, "k")
    assert(g2 == 3 && d2.select("k").as[Long].collect().toSeq == Seq(3L))
  }

  test("string keys: native-typed manifest stats prune lexicographically") {
    import spark.implicits._
    val dir = tmpDir("mergetab-strkey")
    val base = (1 to 400).map(i => (f"key-$i%05d", s"seg${i % 3}", i * 2.0))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, base, "k", dir, nFiles = 4)
    val man0 = MergeTable.manifest(spark, dir).collect()
    assert(man0.forall(r => r.getAs[Any]("min_k").isInstanceOf[String]), "stats lost the key type")
    // banded change: only keys < key-00100 → one file's range
    val changes = Seq(
      ("key-00010", "U", "WEB", 999.0),
      ("key-00020", "D", null, 0.0),
      ("zzz-99999", "I", "NEW", 1.0)).toDF("k", "op", "seg", "bal")
    val stats = MergeTable.merge(spark, dir, changes, "k")
    val expectedTouched = man0.filter(r =>
      Seq("key-00010", "key-00020").exists(k =>
        k >= r.getAs[String]("min_k") && k <= r.getAs[String]("max_k"))).map(_.getAs[String]("path")).toSet
    assert(stats.touched.toSet == expectedTouched, s"string pruning wrong: $stats")
    assert(stats.untouched.size >= 3)
    // pruned scan on a lexicographic band
    val got = MergeTable.scanRange(spark, dir, "k", "key-00015", "key-00025")
      .select("k").as[String].collect().sorted.toSeq
    assert(got == (15 to 25).filter(_ != 20).map(i => f"key-$i%05d"),
      s"string scanRange wrong: $got")
    // CDC types survive
    val cdc = MergeTable.changesBetween(spark, dir, 0, 1, "k")
      .select("k", "change_op").as[(String, String)].collect().sorted.toSeq
    assert(cdc == Seq(("key-00010", "U"), ("key-00020", "D"), ("zzz-99999", "I")))
  }

  test("long string keys: manifest stats truncate to 32-char bounds and still prune exactly") {
    import spark.implicits._
    // bound arithmetic first
    assert(MergeTable.truncUpperBound("short") == "short")
    assert(MergeTable.truncUpperBound(null) == null)
    val long = "user-00042-" + "p" * 60
    val ub = MergeTable.truncUpperBound(long)
    assert(ub.length <= 32 && ub > long, s"'$ub' must dominate the full value")
    assert(ub == long.substring(0, 31) + "q", s"expected last-char bump, got '$ub'")
    // the rightmost sub-0x7f char carries: a prefix padded with DEL
    // bumps an earlier char instead of leaving ASCII
    val del = "ab" + "" * 40
    assert(MergeTable.truncUpperBound(del) == "ac")
    assert(MergeTable.truncUpperBound("é" * 40) == null,
      "non-incrementable prefix must yield the null can't-prune stat")

    // a table whose keys are 70+ chars: stats must not round-trip whole
    val dir = tmpDir("mergetab-longkey")
    val pad = "x" * 60
    def key(i: Int) = f"user-$i%05d-$pad"
    val base = (1 to 400).map(i => (key(i), i * 2.0)).toDF("k", "bal")
    MergeTable.write(spark, base, "k", dir, nFiles = 4)
    val man = MergeTable.manifest(spark, dir).collect()
    assert(man.forall(r => r.getAs[String]("min_k").length <= 32 &&
      r.getAs[String]("max_k").length <= 32),
      "long keys round-tripped whole into the manifest")
    // truncated bounds still bracket each file's true span
    man.foreach { r =>
      val ks = spark.read.parquet(r.getAs[String]("path"))
        .select("k").as[String].collect()
      assert(r.getAs[String]("min_k") <= ks.min && r.getAs[String]("max_k") >= ks.max,
        s"file band [${r.getAs[String]("min_k")}, ${r.getAs[String]("max_k")}] lost [${ks.min}, ${ks.max}]")
    }
    // band scan: exact result, and the truncated stats still prune
    // (keys differ inside the 32-char prefix, so files keep disjoint
    // truncated spans)
    val got = MergeTable.scanRange(spark, dir, "k", key(15), key(25))
      .select("k").as[String].collect().sorted.toSeq
    assert(got == (15 to 25).map(key).toSeq, s"truncated-stats band scan wrong: $got")
    val admitted = man.count(r =>
      r.getAs[String]("max_k") >= key(15) && r.getAs[String]("min_k") <= key(25))
    assert(admitted < man.length, "truncated stats prune nothing")
    // merge banding stays sound on truncated bounds
    val stats = MergeTable.merge(spark, dir,
      Seq((key(20), "U", 999.0), (key(999), "I", 1.0)).toDF("k", "op", "bal"), "k")
    assert(stats.untouched.nonEmpty, "string-band merge touched every file")
    val after = MergeTable.readTable(spark, dir)
    assert(after.filter(col("k") === key(20)).select("bal").as[Double].head() == 999.0)
    assert(after.count() == 401)
  }

  test("null truncated stats: merge treats a boundless file as touched, never drops the change") {
    import spark.implicits._
    // keys are 40 non-ASCII chars + a numeric suffix: the 32-char
    // prefix has no incrementable ASCII char, so max_k truncates to
    // NULL — the can't-prune stat. A U/D against such a file must
    // classify it TOUCHED (null-admits), not silently discard the
    // change through a null join predicate.
    val dir = tmpDir("mergetab-nullstat")
    def key(i: Int) = "é" * 40 + f"$i%05d"
    val base = (1 to 200).map(i => (key(i), i * 2.0)).toDF("k", "bal")
    MergeTable.write(spark, base, "k", dir, nFiles = 4)
    val man = MergeTable.manifest(spark, dir).collect()
    assert(man.forall(_.getAs[String]("max_k") == null),
      "fixture vacuous: expected every max_k to truncate to null")
    MergeTable.merge(spark, dir,
      Seq((key(50), "U", 999.0), (key(60), "D", 0.0)).toDF("k", "op", "bal"), "k")
    val after = MergeTable.readTable(spark, dir)
    assert(after.filter(col("k") === key(50)).select("bal").as[Double].head() == 999.0,
      "update silently dropped on a null-stat file")
    assert(after.filter(col("k") === key(60)).isEmpty,
      "delete silently dropped on a null-stat file")
    assert(after.count() == 199)
  }

  test("restore: rollback is a forward commit that re-references old files") {
    import spark.implicits._
    val dir = tmpDir("mergetab-restore")
    val base = (1 to 300).map(i => (i.toLong, s"seg${i % 3}", i * 2.0))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, base, "k", dir, nFiles = 4)
    val baseRows = MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq
    // two generations of churn
    MergeTable.merge(spark, dir, Seq((5L, "U", "WEB", 9.9), (400L, "I", "NEW", 1.0))
      .toDF("k", "op", "seg", "bal"), "k")
    MergeTable.merge(spark, dir, Seq((7L, "D", null: String, 0.0))
      .toDF("k", "op", "seg", "bal"), "k")
    assert(MergeTable.committedGen(dir).contains(2))
    // restore: history moves FORWARD, content moves back
    assert(MergeTable.restore(spark, dir, 0) == 3)
    assert(MergeTable.committedGen(dir).contains(3))
    assert(MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq == baseRows)
    // nothing was copied: the restored manifest references gen-0 paths
    val restoredPaths = MergeTable.manifestAt(spark, dir, 3)
      .select("path").as[String].collect().toSet
    assert(restoredPaths == MergeTable.manifestAt(spark, dir, 0)
      .select("path").as[String].collect().toSet)
    // the CDC feed carries the rollback as a net inverse delta
    val inv = MergeTable.changesBetween(spark, dir, 2, 3, "k")
      .select("k", "change_op").as[(Long, String)].collect().sorted.toSeq
    assert(inv == Seq((5L, "U"), (7L, "I"), (400L, "D")),
      s"restore delta should revert the churn: $inv")
    // the pruned read paths work against the restored manifest too
    assert(MergeTable.scanRange(spark, dir, "k", 5L, 7L)
      .select("k").as[Long].collect().sorted.toSeq == Seq(5L, 6L, 7L))
    assert(MergeTable.readIndexed(spark, dir).filter(col("k") === 7L).count() == 1)
    // time travel still sees the pre-restore state
    assert(MergeTable.readTable(spark, dir, asOf = Some(2))
      .filter(col("k") === 400L).count() == 1)
    // vacuum keeps the CURRENT (restored) state readable, and a
    // restore to a vacuumed point fails loudly instead of resurrecting
    // a partial table
    MergeTable.vacuum(spark, dir)
    assert(MergeTable.readTable(spark, dir)
      .as[(Long, String, Double)].collect().sorted.toSeq == baseRows)
    val e = intercept[Exception] { MergeTable.restore(spark, dir, 2) }
    assert(e.getMessage.contains("vacuum") || e.getMessage.contains("exist"),
      s"unexpected restore failure mode: ${e.getMessage}")
  }

  test("history: one lineage row per generation, newest first, vacuum-proof") {
    import spark.implicits._
    val dir = tmpDir("mergetab-history")
    val base = (1 to 200).map(i => (i.toLong, s"seg${i % 3}", i * 2.0))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, base, "k", dir, nFiles = 4)
    MergeTable.merge(spark, dir, Seq((5L, "U", "WEB", 9.9))
      .toDF("k", "op", "seg", "bal"), "k")
    MergeTable.deleteWhere(spark, dir, "k", "k", Some(10L), Some(20L))
    MergeTable.restore(spark, dir, 1)
    val h = MergeTable.history(spark, dir)
      .select("gen", "op").as[(Int, String)].collect().toSeq
    assert(h == Seq((3, "restore"), (2, "delete"), (1, "merge"), (0, "write")),
      s"history wrong: $h")
    // detail carries the lineage keys, not the bulky schema
    val restoreRow = MergeTable.history(spark, dir).filter(col("gen") === 3)
      .select("detail").as[Map[String, String]].head()
    assert(restoreRow == Map("restore_of" -> "1"), s"detail wrong: $restoreRow")
    // timestamps are stamped and non-decreasing oldest-to-newest
    val ts = MergeTable.history(spark, dir).select("ts").as[Long].collect().reverse
    assert(ts.forall(_ > 0) && ts.sorted.toSeq == ts.toSeq, s"ts not monotone: ${ts.toSeq}")
    // lineage survives vacuum (log entries are never swept)
    MergeTable.vacuum(spark, dir)
    assert(MergeTable.history(spark, dir).count() == 4)
  }

  test("shallow clone: zero-copy fork, divergence isolated, vacuum scoped") {
    import java.nio.file.{Files, Path}
    import spark.implicits._
    val src = tmpDir("mergetab-clonesrc")
    val dst = tmpDir("mergetab-clonedst") + "/t"
    val base = (1 to 300).map(i => (i.toLong, s"seg${i % 3}", i * 2.0))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, base, "k", src, nFiles = 4)
    val srcRows = MergeTable.readTable(spark, src)
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(MergeTable.cloneTable(spark, src, dst) == 0)
    // the clone IS the source, by reference — no data under dst
    assert(MergeTable.readTable(spark, dst)
      .as[(Long, String, Double)].collect().sorted.toSeq == srcRows)
    val dataDirs = {
      val ls = Files.list(Path.of(dst))
      try ls.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("files-g")).toSeq
      finally ls.close()
    }
    assert(dataDirs.isEmpty, s"shallow clone copied data: $dataDirs")
    // divergence: a merge on the clone leaves the source untouched
    MergeTable.merge(spark, dst, Seq((5L, "U", "WEB", 9.9), (400L, "I", "NEW", 1.0))
      .toDF("k", "op", "seg", "bal"), "k")
    assert(MergeTable.readTable(spark, dst).filter(col("k") === 400L).count() == 1)
    assert(MergeTable.readTable(spark, src)
      .as[(Long, String, Double)].collect().sorted.toSeq == srcRows,
      "merge on the clone mutated the source")
    // pruned reads resolve the clone's cross-dir manifest paths (the
    // Catalyst FileIndex stats files in the SOURCE's directory)
    assert(MergeTable.readIndexed(spark, dst).filter(col("k") === 400L).count() == 1)
    assert(MergeTable.scanRange(spark, dst, "k", 10L, 12L)
      .select("k").as[Long].collect().sorted.toSeq == Seq(10L, 11L, 12L))
    // the clone's vacuum sweeps only its own dirs: shared gen-0 files
    // survive and both tables stay intact
    MergeTable.vacuum(spark, dst)
    assert(MergeTable.readTable(spark, dst).filter(col("k") === 400L).count() == 1)
    assert(MergeTable.readTable(spark, src)
      .as[(Long, String, Double)].collect().sorted.toSeq == srcRows)
    // cloning onto an existing table is refused
    val e = intercept[IllegalArgumentException] {
      MergeTable.cloneTable(spark, src, dst)
    }
    assert(e.getMessage.contains("already"))
    // lineage is recorded
    assert(MergeTable.metaAt(dst, 0).get("cloned_from").exists(_.contains("@g0")))
  }

  test("writeClustered: z-order makes every cluster column file-prunable at once") {
    import spark.implicits._
    val dirZ = tmpDir("mergetab-zorder")
    val dirR = tmpDir("mergetab-rangekey")
    // 64×64 grid, x and y independent; k = x*64+y means the key-range
    // layout is an x-slab layout: perfectly selective on x, useless on y
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("k", "x", "y")
    MergeTable.writeClustered(spark, grid, "k", Seq("x", "y"), dirZ, nFiles = 16)
    MergeTable.write(spark, grid, "k", dirR, nFiles = 16)
    def filesAdmitted(dir: String, c: String, lo: Long, hi: Long): Int =
      MergeTable.manifest(spark, dir)
        .filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi).count().toInt
    // correctness first: a band scan equals the full-scan filter
    val want = grid.filter(col("y") >= 10 && col("y") <= 17)
      .select("k").as[Long].collect().sorted.toSeq
    val gotZ = MergeTable.scanWhere(spark, dirZ, "y", 10L, 17L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(gotZ == want, "z-layout band scan lost rows")
    // pruning: the key-range layout admits EVERY file for a y band;
    // the z layout skips a solid fraction on BOTH dimensions
    assert(filesAdmitted(dirR, "y", 10, 17) == 16,
      "x-slab layout should be useless on y (the contrast)")
    val zy = filesAdmitted(dirZ, "y", 10, 17)
    val zx = filesAdmitted(dirZ, "x", 10, 17)
    assert(zy <= 10, s"z-order failed to prune on y: $zy/16 files admitted")
    assert(zx <= 10, s"z-order failed to prune on x: $zx/16 files admitted")
    // a merge on a z table stays CORRECT (key stats still prune)
    MergeTable.merge(spark, dirZ,
      Seq((5L, "U", 99L, 99L)).toDF("k", "op", "x", "y"), "k")
    assert(MergeTable.readTable(spark, dirZ).filter(col("k") === 5L)
      .select("x").as[Long].head() == 99L)
  }

  test("readIndexed: Catalyst pushes query filters into the manifest-backed file index") {
    import spark.implicits._
    val dir = tmpDir("mergetab-fidx")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val man = MergeTable.manifest(spark, dir).collect()
    // a plain .filter — no scanWhere — must both compute the right
    // band and open only the manifest-intersecting files
    val q = MergeTable.readIndexed(spark, dir)
      .filter(col("k") >= 100 && col("k") <= 220)
    val got = q.collect().map(_.getAs[Long]("k")).sorted.toSeq
    assert(got == (100L to 220L).toSeq, s"pushdown band lost rows: ${got.size}")
    val expected = man.count(r =>
      220L >= r.getAs[Long]("min_k") && 100L <= r.getAs[Long]("max_k"))
    assert(scanOf(q).metrics("numFiles").value == expected && expected <= 3,
      s"pushdown admitted ${scanOf(q).metrics("numFiles").value} files, manifest intersects $expected")
    // an un-prunable predicate shape: all files admitted, result exact
    val q2 = MergeTable.readIndexed(spark, dir).filter(col("k") % 97 === 0)
    assert(q2.count() == (1 to 1000).count(_ % 97 == 0))
    // NOT of a closed band: files wholly INSIDE the band are provably
    // all-TRUE for the inner predicate, so the negation skips them —
    // the inverse prune of the band scan above
    val qn = MergeTable.readIndexed(spark, dir)
      .filter(!(col("k") >= 100 && col("k") <= 900))
    val gotN = qn.collect().map(_.getAs[Long]("k")).sorted.toSeq
    assert(gotN == ((1L to 99L) ++ (901L to 1000L)).toSeq, "NOT-band lost rows")
    val expectedN = man.count(r =>
      !(r.getAs[Long]("min_k") >= 100L && r.getAs[Long]("max_k") <= 900L))
    val admittedN = scanOf(qn).metrics("numFiles").value
    assert(admittedN == expectedN && expectedN < 8,
      s"NOT-band admitted $admittedN files, manifest proves $expectedN of 8")
    // IsNotNull rides every pushed filter set; on a null-free column
    // it admits every file (nn == n_rows everywhere, so no IsNotNull
    // skip fires) — numFiles stays the band's count
    val qnn = MergeTable.readIndexed(spark, dir)
      .filter(col("k").isNotNull && col("k") >= 100 && col("k") <= 220)
    assert(qnn.collect().length == 121)
    assert(scanOf(qnn).metrics("numFiles").value == expected,
      "IsNotNull changed the band's file admission")
    // SQL BETWEEN desugars to the closed And pair — same prune as the
    // explicit bounds
    MergeTable.readIndexed(spark, dir).createOrReplaceTempView("fidx_t")
    val qb = spark.sql("SELECT k FROM fidx_t WHERE k BETWEEN 100 AND 220")
    assert(qb.collect().length == 121)
    assert(scanOf(qb).metrics("numFiles").value == expected,
      "SQL BETWEEN prunes differently from the explicit And pair")
    // null-safe point lookup (<=>): same bounds proof as = against a
    // non-null literal — prunes to the one intersecting file
    val qns = MergeTable.readIndexed(spark, dir).filter(col("k") <=> 150L)
    assert(qns.collect().map(_.getAs[Long]("k")).toSeq == Seq(150L))
    val expectedNs = man.count(r =>
      150L >= r.getAs[Long]("min_k") && 150L <= r.getAs[Long]("max_k"))
    assert(scanOf(qns).metrics("numFiles").value == expectedNs && expectedNs < 8,
      "null-safe equality failed to prune")
    // NOT-equals against a constant file: provably all-equal → skipped
    val dirC = tmpDir("mergetab-fidx-const")
    val mixed = ((1 to 100).map(i => (i.toLong, 7L)) ++
      (101 to 200).map(i => (i.toLong, i.toLong))).toDF("k", "v")
    MergeTable.write(spark, mixed, "k", dirC, nFiles = 2)
    val manC = MergeTable.manifest(spark, dirC).collect()
    val qc = MergeTable.readIndexed(spark, dirC).filter(col("v") =!= 7L)
    assert(qc.collect().map(_.getAs[Long]("k")).sorted.toSeq ==
      (101L to 200L).toSeq, "NOT-equals lost rows")
    val expectedC = manC.count(r =>
      !(r.getAs[Long]("min_v") == 7L && r.getAs[Long]("max_v") == 7L))
    assert(scanOf(qc).metrics("numFiles").value == expectedC && expectedC < 2,
      s"NOT-equals failed to skip the constant file ($expectedC of 2 expected)")
    // z-layout: pushdown prunes on the SECOND clustered dimension too
    val dirZ = tmpDir("mergetab-fidx-z")
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("k", "x", "y")
    MergeTable.writeClustered(spark, grid, "k", Seq("x", "y"), dirZ, nFiles = 16)
    val qz = MergeTable.readIndexed(spark, dirZ)
      .filter(col("y") >= 10 && col("y") <= 17)
    val gotZ = qz.collect().map(_.getAs[Long]("k")).sorted.toSeq
    val wantZ = grid.filter(col("y").between(10, 17))
      .select("k").as[Long].collect().sorted.toSeq
    assert(gotZ == wantZ, "z pushdown band lost rows")
    val zFiles = scanOf(qz).metrics("numFiles").value
    assert(zFiles <= 10, s"z + pushdown failed to prune on y: $zFiles/16 files")
  }

  test("readIndexed: date and timestamp bands prune files via the manifest") {
    import spark.implicits._
    // k-ordered writes make the correlated date/ts columns contiguous
    // per file — the single most common fact-table layout (time-ordered
    // ingest) whose date-band filters the index must prune
    val dir = tmpDir("mergetab-fidx-date")
    val rows = (1 to 365).map { k =>
      (k.toLong,
       java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(k - 1)),
       java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
         .plusDays(k - 1)))
    }.toDF("k", "d", "ts")
    MergeTable.write(spark, rows, "k", dir, nFiles = 8)
    val man = MergeTable.manifest(spark, dir).collect()

    val lo = java.sql.Date.valueOf("2024-04-10")
    val hi = java.sql.Date.valueOf("2024-04-20")
    val q = MergeTable.readIndexed(spark, dir)
      .filter(col("d") >= lit(lo) && col("d") <= lit(hi))
    val got = q.collect().map(_.getAs[Long]("k")).sorted.toSeq
    assert(got == (101L to 111L).toSeq, s"date band wrong rows: $got")
    val expected = man.count(r =>
      !r.getAs[java.sql.Date]("min_d").after(hi) &&
      !r.getAs[java.sql.Date]("max_d").before(lo))
    val admitted = scanOf(q).metrics("numFiles").value
    assert(admitted == expected && expected < 8,
      s"date band admitted $admitted files, manifest intersects $expected of 8")

    val tlo = java.sql.Timestamp.valueOf("2024-04-10 00:00:00")
    val thi = java.sql.Timestamp.valueOf("2024-04-20 00:00:00")
    val qt = MergeTable.readIndexed(spark, dir)
      .filter(col("ts") >= lit(tlo) && col("ts") <= lit(thi))
    assert(qt.collect().length == 11, "timestamp band wrong row count")
    val admittedT = scanOf(qt).metrics("numFiles").value
    assert(admittedT == expected && admittedT < 8,
      s"timestamp band admitted $admittedT files, expected $expected")
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
    // an empty committed table still reads: zero rows, log schema
    val t = MergeTable.readTable(spark, dir)
    assert(t.isEmpty && t.columns.toSeq == Seq("k", "seg", "bal"))
  }

  // ---- predicate DML ----

  private def dataFilesUnder(dir: String): Set[String] = {
    val s = Files.walk(Path.of(dir))
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        p.getParent.getFileName.toString.startsWith("files-g"))
      .map(_.toString).toSet
    finally s.close()
  }

  test("deleteWhere drops a fully-covered file METADATA-ONLY: zero data IO") {
    import spark.implicits._
    val dir = tmpDir("mergetab-del")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val man0 = MergeTable.manifest(spark, dir).collect()
    // an interior file's exact [min_k, max_k]: every row of it (and
    // only it) is provably in the band
    val f = man0.sortBy(_.getAs[Long]("min_k")).apply(3)
    val (lo, hi) = (f.getAs[Long]("min_k"), f.getAs[Long]("max_k"))
    val filesBefore = dataFilesUnder(dir)
    val mt0 = mtimesOf(man0.map(_.getString(0)).toSeq)

    val stats = MergeTable.deleteWhere(spark, dir, "k", "k", Some(lo), Some(hi))
    assert(stats.dropped == Seq(f.getString(0)),
      s"expected exactly the covered file dropped, got ${stats.dropped}")
    assert(stats.rewritten.isEmpty,
      s"nothing should rewrite for a file-aligned band: ${stats.rewritten}")
    assert(stats.carried.size == 7)
    // METADATA-ONLY: not one data file was written anywhere
    assert(dataFilesUnder(dir) == filesBefore,
      "a fully-covered delete wrote data files")
    stats.carried.foreach(p => assert(mtimesOf(Seq(p))(p) == mt0(p)))
    // the rows are gone, everything else intact
    val got = MergeTable.readTable(spark, dir).select("k")
      .as[Long].collect().sorted.toSeq
    assert(got == (1L to 1000L).filterNot(k => k >= lo && k <= hi))
    // CDC reports the dropped rows as D with pre-images, for free
    val cdc = MergeTable.changesBetween(spark, dir, 0, 1, "k")
    assert(cdc.filter(col("change_op") =!= "D").isEmpty)
    assert(cdc.select("k").as[Long].collect().sorted.toSeq == (lo to hi))
    // vacuum reclaims the dropped file (unreferenced by the committed manifest)
    assert(MergeTable.vacuum(spark, dir) > 0)
    assert(!Files.exists(Path.of(java.net.URI.create(f.getString(0)))))
  }

  test("deleteWhere triage: interior files drop, boundary files rewrite, rest carry") {
    import spark.implicits._
    val dir = tmpDir("mergetab-del2")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val man0 = MergeTable.manifest(spark, dir).collect()
    val (lo, hi) = (100L, 400L)
    val stats = MergeTable.deleteWhere(spark, dir, "k", "k", Some(lo), Some(hi))
    val expectDrop = man0.filter(r =>
      r.getAs[Long]("min_k") >= lo && r.getAs[Long]("max_k") <= hi)
      .map(_.getString(0)).toSet
    val expectRewrite = man0.filter { r =>
      val (mn, mx) = (r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))
      mx >= lo && mn <= hi && !(mn >= lo && mx <= hi) // straddles a bound
    }.map(_.getString(0)).toSet
    assert(stats.dropped.toSet == expectDrop && expectDrop.nonEmpty)
    assert(stats.rewritten.toSet == expectRewrite && expectRewrite.nonEmpty)
    assert(stats.carried.size == 8 - expectDrop.size - expectRewrite.size)
    val got = MergeTable.readTable(spark, dir).select("k")
      .as[Long].collect().sorted.toSeq
    assert(got == (1L to 1000L).filterNot(k => k >= lo && k <= hi))
  }

  test("deleteWhere: a null-valued row's predicate is UNKNOWN — it survives, and its file never drops whole") {
    import spark.implicits._
    val dir = tmpDir("mergetab-delnull")
    // bal is null on multiples of 10: ANSI DELETE ... WHERE bal
    // BETWEEN ... must leave those rows alone
    val t = (1 to 100).map(k =>
      (k.toLong, s"seg${k % 4}", if (k % 10 == 0) null else java.lang.Double.valueOf(k * 1.0)))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, t, "k", dir, nFiles = 2)
    // the band covers EVERY non-null bal — yet no file may drop
    // metadata-only, because nn_bal < n_rows on both
    val stats = MergeTable.deleteWhere(spark, dir, "k", "bal",
      Some(0.0), Some(1000.0))
    assert(stats.dropped.isEmpty,
      s"a file holding null-band rows was dropped whole: ${stats.dropped}")
    assert(stats.rewritten.nonEmpty)
    val survivors = MergeTable.readTable(spark, dir).select("k")
      .as[Long].collect().sorted.toSeq
    assert(survivors == (10L to 100L by 10L),
      s"only the null-bal rows should survive: $survivors")
  }

  test("deleteWhere: one-sided retention band, no-op band, and full-table delete") {
    import spark.implicits._
    val dir = tmpDir("mergetab-del3")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    // retention shape: everything before the cutoff goes; interior
    // files drop metadata-only, the cutoff file rewrites
    val stats = MergeTable.deleteWhere(spark, dir, "k", "k", None, Some(300L))
    assert(stats.dropped.nonEmpty && stats.rewritten.size <= 1)
    assert(MergeTable.readTable(spark, dir).select("k")
      .as[Long].collect().sorted.toSeq == (301L to 1000L))
    // provably-disjoint band: the generation must NOT advance
    val gen1 = MergeTable.committedGen(dir).get
    val noop = MergeTable.deleteWhere(spark, dir, "k", "k",
      Some(5000L), Some(6000L))
    assert(noop.gen == gen1 && MergeTable.committedGen(dir).contains(gen1))
    // unbounded both sides: the whole table drops, zero data IO,
    // and the empty table still reads with its schema
    val filesBefore = dataFilesUnder(dir)
    val all = MergeTable.deleteWhere(spark, dir, "k", "k", None, None)
    assert(all.rewritten.isEmpty && all.carried.isEmpty && all.dropped.nonEmpty)
    assert(dataFilesUnder(dir) == filesBefore)
    val t = MergeTable.readTable(spark, dir)
    assert(t.isEmpty && t.columns.toSeq == Seq("k", "seg", "bal"))
  }

  test("updateWhere rewrites only band-intersecting files; CDC reports the U rows") {
    import spark.implicits._
    val dir = tmpDir("mergetab-upd")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val man0 = MergeTable.manifest(spark, dir).collect()
    val mt0 = mtimesOf(man0.map(_.getString(0)).toSeq)
    val stats = MergeTable.updateWhere(spark, dir, "k", "k",
      Some(100L), Some(200L),
      Map("seg" -> lit("WEB"), "bal" -> (col("bal") * 2)))
    val expectTouch = man0.filter { r =>
      val (mn, mx) = (r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))
      mx >= 100L && mn <= 200L
    }.map(_.getString(0)).toSet
    assert(stats.rewritten.toSet == expectTouch && stats.dropped.isEmpty)
    stats.carried.foreach(p => assert(mtimesOf(Seq(p))(p) == mt0(p),
      s"carried file $p was rewritten"))
    val got = MergeTable.readTable(spark, dir)
      .select("k", "seg", "bal").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    got.foreach { case (k, seg, bal) =>
      if (k >= 100L && k <= 200L)
        assert(seg == "WEB" && bal == k * 3.0, s"row $k not updated")
      else
        assert(seg == s"seg${k % 4}" && bal == k * 1.5, s"row $k corrupted")
    }
    // CDC: exactly the band rows, all U, post-images
    val cdc = MergeTable.changesBetween(spark, dir, 0, 1, "k")
    assert(cdc.filter(col("change_op") =!= "U").isEmpty)
    assert(cdc.select("k").as[Long].collect().sorted.toSeq == (100L to 200L))
    // no-op band: generation does not advance
    val gen1 = MergeTable.committedGen(dir).get
    val noop = MergeTable.updateWhere(spark, dir, "k", "k",
      Some(5000L), Some(6000L), Map("seg" -> lit("X")))
    assert(noop.gen == gen1 && MergeTable.committedGen(dir).contains(gen1))
  }

  test("updateWhere guards: unknown set column, key reassignment, null-band rows untouched") {
    import spark.implicits._
    val dir = tmpDir("mergetab-upd2")
    val t = (1 to 100).map(k =>
      (k.toLong, s"seg${k % 4}", if (k % 10 == 0) null else java.lang.Double.valueOf(k * 1.0)))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, t, "k", dir, nFiles = 2)
    intercept[IllegalArgumentException] {
      MergeTable.updateWhere(spark, dir, "k", "k", None, None,
        Map("nope" -> lit(1)))
    }
    intercept[IllegalArgumentException] {
      MergeTable.updateWhere(spark, dir, "k", "k", None, None,
        Map("k" -> lit(1L)))
    }
    // band on bal: null-bal rows' predicate is UNKNOWN → untouched
    MergeTable.updateWhere(spark, dir, "k", "bal", Some(0.0), Some(1000.0),
      Map("seg" -> lit("HIT")))
    val got = MergeTable.readTable(spark, dir)
      .select("k", "seg").as[(Long, String)].collect().sortBy(_._1).toSeq
    got.foreach { case (k, seg) =>
      if (k % 10 == 0) assert(seg == s"seg${k % 4}", s"null-band row $k updated")
      else assert(seg == "HIT", s"row $k missed")
    }
    // the int literal was cast to the column type: the table still
    // reads under the unchanged log schema (exercised by the reads above)
  }

  test("null checks prune files via the manifest's non-null counts (r20)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-nullskip")
    // k-ranged layout where v's nullness CLUSTERS with the key: low
    // files all-null, high files null-free, one boundary file mixed
    val t = (1 to 600).map { k =>
      val v = if (k <= 290) null
        else if (k <= 310 && k % 2 == 0) null
        else java.lang.Long.valueOf(k * 10L)
      (k.toLong, v)
    }.toDF("k", "v")
    MergeTable.write(spark, t, "k", dir, nFiles = 6)
    val man = MergeTable.manifest(spark, dir).collect()
    val mayNull = man.count(r => r.getAs[Long]("nn_v") < r.getAs[Long]("n_rows"))
    val mayValue = man.count(r => r.getAs[Long]("nn_v") > 0)
    assert(mayNull < 6 && mayValue < 6,
      s"fixture must leave both checks provable somewhere ($mayNull/$mayValue of 6)")
    // IS NULL through Catalyst pushdown: opens only may-null files
    val qn = MergeTable.readIndexed(spark, dir).filter(col("v").isNull)
    val nNull = qn.collect().length // execute THIS plan before reading its metric
    assert(nNull == (1 to 600).count(k => k <= 290 || (k <= 310 && k % 2 == 0)))
    assert(scanOf(qn).metrics("numFiles").value == mayNull,
      s"IS NULL admitted ${scanOf(qn).metrics("numFiles").value}, counts prove $mayNull")
    // IS NOT NULL: opens only may-value files
    val qv = MergeTable.readIndexed(spark, dir).filter(col("v").isNotNull)
    val nVal = qv.collect().length
    assert(nVal == (1 to 600).count(k => k > 310 || (k > 290 && k % 2 == 1)))
    assert(scanOf(qv).metrics("numFiles").value == mayValue,
      s"IS NOT NULL admitted ${scanOf(qv).metrics("numFiles").value}, counts prove $mayValue")
    // null-safe equality against NULL prunes like IS NULL
    val qns = MergeTable.readIndexed(spark, dir)
      .filter(col("v") <=> lit(null).cast("long"))
    assert(qns.collect().length == nNull)
    assert(scanOf(qns).metrics("numFiles").value == mayNull,
      "<=> NULL prunes differently from IS NULL")
    // the explicit manifest-consult scan agrees with pushdown
    val sn = MergeTable.scanWhereNull(spark, dir, "v", wantNull = true)
    assert(sn.count() == nNull)
    assert(sn.inputFiles.length == mayNull,
      s"scanWhereNull(IS NULL) opened ${sn.inputFiles.length} files, want $mayNull")
    val sv = MergeTable.scanWhereNull(spark, dir, "v", wantNull = false)
    assert(sv.count() == nVal)
    assert(sv.inputFiles.length == mayValue,
      s"scanWhereNull(IS NOT NULL) opened ${sv.inputFiles.length} files, want $mayValue")
    // soundness across an evolution: files predating the column carry
    // NO nn_v stats and must ADMIT both checks (their rows are
    // all-null under the log schema, reachable only via IS NULL)
    val dir2 = tmpDir("mergetab-nullskip-evo")
    MergeTable.write(spark, (1 to 100).map(k => (k.toLong, s"s$k")).toDF("k", "s"),
      "k", dir2, nFiles = 2)
    MergeTable.append(spark, dir2,
      (101 to 200).map(k => (k.toLong, s"s$k", k * 2L)).toDF("k", "s", "v"), "k")
    val evoNull = MergeTable.readIndexed(spark, dir2).filter(col("v").isNull)
    assert(evoNull.count() == 100, "pre-evolution all-null rows lost")
    val evoVal = MergeTable.scanWhereNull(spark, dir2, "v", wantNull = false)
    assert(evoVal.count() == 100)
    // a batch RE-supplying an existing column at a different type is
    // refused before staging (physical type would conflict with the
    // logged schema on later explicit-schema reads)
    val retyped = intercept[IllegalArgumentException] {
      MergeTable.append(spark, dir2,
        (201 to 210).map(k => (k.toLong, s"s$k", k.toString)).toDF("k", "s", "v"),
        "k")
    }
    assert(retyped.getMessage.contains("re-supplies column 'v'"))
  }

  test("non-key string columns are statted: StartsWith and ranges prune files (r20)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-strstat")
    // tag clusters with the key layout (the z-order / ingest-order
    // case): per-file tag spans are contiguous and prefix-disjoint
    val t = (1 to 800).map { k =>
      (k.toLong, f"T${k / 100}%02d-${k % 100}%03d", k * 1.0)
    }.toDF("k", "tag", "bal")
    MergeTable.write(spark, t, "k", dir, nFiles = 8)
    val man = MergeTable.manifest(spark, dir).collect()
    assert(man.head.schema.fieldNames.contains("min_tag"),
      "non-key string column not statted")
    // every stored string stat obeys the truncation cap
    man.foreach { r =>
      assert(r.getAs[String]("min_tag").length <= 32 &&
        r.getAs[String]("max_tag").length <= 32)
    }
    // StartsWith pushdown: only files whose [min,max] admits the prefix
    val qp = MergeTable.readIndexed(spark, dir).filter(col("tag").startsWith("T03-"))
    assert(qp.collect().length == (1 to 800).count(_ / 100 == 3))
    val admittedP = scanOf(qp).metrics("numFiles").value
    assert(admittedP < 8, s"StartsWith failed to prune: $admittedP/8 files")
    // string range band through the explicit manifest consult
    val sb = MergeTable.scanWhere(spark, dir, "tag", "T02-000", "T02-999")
    assert(sb.count() == (1 to 800).count(_ / 100 == 2))
    assert(sb.inputFiles.length < 8,
      s"string band failed to prune: ${sb.inputFiles.length}/8 files")
    // equality pushdown on the string column prunes too
    val qe = MergeTable.readIndexed(spark, dir).filter(col("tag") === "T05-050")
    assert(qe.collect().length == 1)
    assert(scanOf(qe).metrics("numFiles").value < 8)
    // truncation soundness: values LONGER than the cap still land in
    // files the widened bounds admit (min = prefix lower bound, max =
    // incremented-prefix upper bound)
    val dirL = tmpDir("mergetab-strstat-long")
    val long = (1 to 200).map { k =>
      (k.toLong, f"U${k / 50}%02d-" + ("x" * 60) + f"-${k % 50}%03d")
    }.toDF("k", "tag")
    MergeTable.write(spark, long, "k", dirL, nFiles = 4)
    val qlong = MergeTable.readIndexed(spark, dirL)
      .filter(col("tag").startsWith("U02-"))
    assert(qlong.count() == (1 to 200).count(_ / 50 == 2),
      "truncated bounds lost rows under StartsWith")
  }

  test("readTable's manifest-path memo: warm reads skip the manifest job, never stale (r20)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-memo")
    MergeTable.write(spark, (1 to 100).map(k => (k.toLong, k * 2L)).toDF("k", "v"),
      "k", dir, nFiles = 4)
    assert(MergeTable.readTable(spark, dir).count() == 100)
    // warm read: same committed generation resolves the memoized path
    // list (content identical)
    assert(MergeTable.readTable(spark, dir).count() == 100)
    // a NEW COMMIT changes the generation, so the memo misses by key
    // and the read reflects the append
    MergeTable.append(spark, dir,
      (101 to 120).map(k => (k.toLong, k * 2L)).toDF("k", "v"), "k")
    assert(MergeTable.readTable(spark, dir).count() == 120,
      "stale memo served a pre-append path list")
    // a deletion-vector commit is also a new generation; hidden rows
    // disappear through the memoized resolution too
    MergeTable.deleteKeys(spark, dir, "k", Seq(5L, 6L, 7L))
    assert(MergeTable.readTable(spark, dir).count() == 117)
    // time travel through the memo: the old generation's list is
    // keyed separately and still resolves
    assert(MergeTable.readTable(spark, dir, asOf = Some(0)).count() == 100)
    // RE-CREATING the table mints a fresh gen-0 token: the old
    // (dir, 0, token) entry can't alias the new table
    MergeTable.write(spark, (1 to 7).map(k => (k.toLong, k * 3L)).toDF("k", "v"),
      "k", dir, nFiles = 2)
    assert(MergeTable.readTable(spark, dir).count() == 7,
      "memo aliased a re-created table's generation 0")
    assert(MergeTable.readTable(spark, dir, asOf = Some(0)).count() == 7)
  }

  test("upsertSink replay is a no-op even across interleaved maintenance commits (r20)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-sinkreplay")
    MergeTable.write(spark, (1 to 50).map(k => (k.toLong, k * 1.0)).toDF("k", "v"),
      "k", dir, nFiles = 2)
    val sink = MergeTable.upsertSink(dir, "k")
    sink((51 to 60).map(k => (k.toLong, "I", k * 1.0)).toDF("k", "op", "v"), 7L)
    assert(MergeTable.readTable(spark, dir).count() == 60)
    // a maintenance commit lands between the batch and its replay —
    // its meta carries no batch key, so a head-only watermark read
    // would forget batch 7 and the replay would re-insert 10 rows
    MergeTable.compact(spark, dir, "k", targetRows = 1000000L)
    MergeTable.deleteKeys(spark, dir, "k", Seq(1L))
    sink((51 to 60).map(k => (k.toLong, "I", k * 1.0)).toDF("k", "op", "v"), 7L)
    assert(MergeTable.readTable(spark, dir).count() == 59,
      "replayed batch re-applied across a maintenance commit")
    assert(MergeTable.readTable(spark, dir)
      .groupBy("k").count().filter(col("count") > 1).isEmpty,
      "duplicate keys after the replay")
    // and the NEXT batch still applies
    sink(Seq((61L, "I", 61.0)).toDF("k", "op", "v"), 8L)
    assert(MergeTable.readTable(spark, dir).count() == 60)
  }

  test("merge guards: bad ops refuse, case-variant columns refuse, meta stays line-safe (r20)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-guards")
    MergeTable.write(spark, (1 to 40).map(k => (k.toLong, s"s$k")).toDF("k", "seg"),
      "k", dir, nFiles = 2)
    // an op outside U/D/I (or null) must refuse loudly, not silently
    // drop the row while the commit lands
    val badOp = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir,
        Seq((1L, "u", "x")).toDF("k", "op", "seg"), "k")
    }
    assert(badOp.getMessage.contains("unsupported op"))
    // a case-variant of an existing column would log duplicate-modulo-
    // case fields and poison every later read
    val caseVar = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir,
        Seq((1L, "U", "x")).toDF("k", "op", "SEG"), "k")
    }
    assert(caseVar.getMessage.contains("case-variant"))
    // a newline in commit meta would smuggle control keys into the
    // k=v marker parse and brick the table head
    val badMeta = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir,
        Seq((1L, "U", "x")).toDF("k", "op", "seg"), "k",
        meta = Map("note" -> "x\ndv=dv-g9~bogus"))
    }
    assert(badMeta.getMessage.contains("single-line"))
    assert(MergeTable.committedGen(dir).contains(0), "a refused merge committed")
  }

  test("merge logs batch-narrower nullability unioned with the prev schema (r20)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-nullability")
    MergeTable.write(spark, (1 to 100).map(k => (k.toLong, s"s$k")).toDF("k", "seg"),
      "k", dir, nFiles = 2)
    // pure-INSERT batch introducing a NON-NULLABLE new column: carried
    // gen-0 files surface it as null, so the logged field must be
    // nullable or Catalyst folds IS NULL over those rows to empty
    MergeTable.merge(spark, dir,
      (101 to 110).map(k => (k.toLong, "I", s"s$k", k * 2L)).toDF("k", "op", "seg", "src"),
      "k")
    assert(MergeTable.readTable(spark, dir).filter(col("src").isNull).count() == 100,
      "pre-evolution rows lost from the null audit")
    assert(MergeTable.readIndexed(spark, dir).filter(col("src").isNull).count() == 100)
  }

  test("band scans and CDC survive a table deleted to empty (r20)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-emptyscan")
    MergeTable.write(spark, (1 to 30).map(k => (k.toLong, k * 1.0)).toDF("k", "v"),
      "k", dir, nFiles = 2)
    MergeTable.deleteWhere(spark, dir, "k", "k", None, None) // delete everything
    // a retention job that banded-deletes to empty must not crash the
    // downstream band scans — empty TYPED frames, readTable's posture
    assert(MergeTable.scanRange(spark, dir, "k", 1L, 10L).isEmpty)
    assert(MergeTable.scanWhereNull(spark, dir, "v", wantNull = true).isEmpty)
    assert(MergeTable.scanRange(spark, dir, "k", 1L, 10L).columns.toSeq ==
      Seq("k", "v"))
    // a metadata-only commit after the delete: the CDC span between
    // two EMPTY generations is an empty typed delta, not a crash loop
    val g = MergeTable.commitCarryForward(dir, Map("op" -> "stamp"))
    val delta = MergeTable.changesBetween(spark, dir, g - 1, g, "k")
    assert(delta.isEmpty && delta.columns.contains("change_op"))
  }

  test("partial recluster's baseline survives past a commit-log checkpoint (r20)") {
    import spark.implicits._
    val dir = tmpDir("mergetab-clusterckpt")
    val t = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong * 32 + y, x.toLong, y.toLong)).toDF("k", "x", "y")
    MergeTable.writeClustered(spark, t, "k", Seq("x", "y"), dir, nFiles = 8)
    // push the cluster commit PAST a checkpoint with maintenance noise
    (1 to MergeTable.checkpointInterval + 2).foreach(i =>
      MergeTable.commitCarryForward(dir, Map("op" -> "stamp", "i" -> i.toString)))
    assert(MergeTable.lastCheckpointGen(dir).isDefined, "fixture never checkpointed")
    // degrade the layout with a small merge, then partial-recluster:
    // the baseline (gen 0) resolves through the checkpoint's rollup —
    // the bounded tail walk alone would miss it and fall back to a
    // FULL rewrite
    MergeTable.merge(spark, dir,
      Seq((5L, "U", 99L, 99L)).toDF("k", "op", "x", "y"), "k")
    val st = MergeTable.reclusterPartial(spark, dir, "k", Seq("x", "y"))
    assert(st.untouched.nonEmpty,
      "baseline lost past the checkpoint: partial degenerated to a full rewrite")
    assert(st.touched.nonEmpty && st.touched.size < st.untouched.size)
  }
}
