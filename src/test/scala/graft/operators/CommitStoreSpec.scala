package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** The storage seam under the OCC commit protocol: every atomicity
  * claim the table format makes (generation CAS, governance CAS,
  * checkpoint/pointer replace, horizon replace, crash-staging
  * invisibility) must hold against ANY [[CommitStore]], not just the
  * POSIX filesystem — an object-store deployment has conditional put
  * and plain PUT, no `link(2)`, no atomic rename. These specs replay
  * the OCC suites against [[InMemoryCommitStore]] (the object-store
  * stand-in: no FS reflection at all) plus a fault-injecting wrapper,
  * and assert the control files genuinely bypass the filesystem — so
  * a future regression that sneaks a direct `Files.createLink` back
  * into the commit path fails here, not in production.
  */
class CommitStoreSpec extends SparkSpecBase {
  import spark.implicits._

  /** Injects store-level failures: `failCas` next putIfAbsent calls
    * return false (a conditional-put 412 without a real winner — the
    * retry MUST converge, not wedge); `failReplace` next putReplace
    * calls throw (a checkpoint/pointer write dying mid-commit — the
    * commit MUST stay durable and resolution fall back).
    */
  private final class FaultyStore(inner: InMemoryCommitStore) extends CommitStore {
    val failCas = new java.util.concurrent.atomic.AtomicInteger(0)
    val failReplace = new java.util.concurrent.atomic.AtomicInteger(0)
    val casAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
    def putIfAbsent(p: Path, b: Array[Byte]): Boolean = {
      casAttempts.incrementAndGet()
      if (failCas.getAndUpdate(n => math.max(0, n - 1)) > 0) false
      else inner.putIfAbsent(p, b)
    }
    def putReplace(p: Path, b: Array[Byte]): Unit = {
      if (failReplace.getAndUpdate(n => math.max(0, n - 1)) > 0)
        throw new java.io.IOException("injected putReplace failure")
      inner.putReplace(p, b)
    }
    def read(p: Path): Option[Array[Byte]] = inner.read(p)
    def exists(p: Path): Boolean = inner.exists(p)
    def list(d: Path): Seq[String] = inner.list(d)
    def delete(p: Path): Boolean = inner.delete(p)
    def mtimeMillis(p: Path): Option[Long] = inner.mtimeMillis(p)
  }

  private def withStore[A](prefix: String)(
      body: (String, FaultyStore, InMemoryCommitStore) => A): A = {
    val dir = tmpDir(prefix)
    val mem = new InMemoryCommitStore
    val st = new FaultyStore(mem)
    CommitStore.register(dir, st)
    try body(dir, st, mem)
    finally CommitStore.unregister(dir)
  }

  private def table(n: Int) =
    (1 to n).map(k => (k.toLong, s"s${k % 4}", k * 1.5)).toDF("k", "seg", "bal")

  test("control files live behind the seam, not on the filesystem") {
    withStore("cs-seam") { (dir, _, mem) =>
      MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
      assert(MergeTable.committedGen(dir).contains(0))
      assert(MergeTable.committedMeta(dir).contains("token"))
      // the marker must NOT exist as a file — a direct Files.createLink
      // sneaking back into commitGen fails exactly here
      assert(Files.notExists(Path.of(dir, "_log", "_commit-g0")),
        "commit marker leaked onto the filesystem past the store")
      assert(mem.size >= 1, "store holds no control files")
      // data/manifest parquet stay on the filesystem (the data plane
      // is published by reference, never atomically renamed)
      assert(MergeTable.readTable(spark, dir).count() == 100)
      MergeTable.merge(spark, dir,
        Seq((1L, "U", "X", 0.0)).toDF("k", "op", "seg", "bal"), "k")
      assert(MergeTable.committedGen(dir).contains(1))
      assert(MergeTable.readTable(spark, dir).filter(col("k") === 1L)
        .select("seg").as[String].head() == "X")
    }
  }

  test("6 concurrent merges on the in-memory store: every update lands exactly once") {
    import scala.jdk.CollectionConverters._
    withStore("cs-occ") { (dir, _, _) =>
      MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
      val writers = 6
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      (1 to writers).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val change = Seq((i.toLong, "U", "WEB", i * 100.0))
              .toDF("k", "op", "seg", "bal")
            var done = false
            var tries = 0
            while (!done && tries < 50) {
              tries += 1
              try { MergeTable.merge(spark, dir, change, "k"); done = true }
              catch { case _: java.util.ConcurrentModificationException => () }
            }
            if (!done) failures.add(new IllegalStateException(s"writer $i starved"))
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
      assert(failures.isEmpty,
        s"writers failed: ${failures.asScala.map(_.toString).toSeq}")
      assert(MergeTable.committedGen(dir).contains(writers),
        s"lost/duplicated commits: ${MergeTable.committedGen(dir)}")
      val t = MergeTable.readTable(spark, dir)
      (1 to writers).foreach { i =>
        assert(t.filter(col("k") === i.toLong).select("seg", "bal")
          .as[(String, Double)].head() == ("WEB", i * 100.0),
          s"writer $i's update lost")
      }
      assert(t.count() == 100)
    }
  }

  test("4-writer carry storm behind the seam: dense log, rollups and pointer in-store") {
    withStore("cs-storm") { (dir, _, mem) =>
      MergeTable.write(spark, table(50), "k", dir, nFiles = 2)
      val threads = 4
      val perThread = 20 // 80 commits → 5 rollups, all under racing
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val futs = (1 to threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = (1 to perThread).foreach { _ =>
            var ok = false
            while (!ok) {
              try {
                MergeTable.commitCarryForward(dir,
                  Map("op" -> "carry", "w" -> t.toString))
                ok = true
              } catch {
                case _: java.util.ConcurrentModificationException => ()
              }
            }
          }
        })
      }
      try futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      finally pool.shutdown()
      val cur = MergeTable.committedGen(dir).get
      assert(cur == threads * perThread, s"lost/duplicated commits: $cur")
      (0 to cur).foreach(g =>
        assert(MergeTable.metaAt(dir, g).contains("token"), s"gen $g torn"))
      val K = MergeTable.checkpointInterval
      assert(MergeTable.lastCheckpointGen(dir).exists(_ >= cur - K),
        s"checkpointing stalled: ${MergeTable.lastCheckpointGen(dir)} vs $cur")
      // the whole log — markers, rollups, pointer — is store-resident
      assert(Files.notExists(Path.of(dir, "_log")) ||
        PosixCommitStore.list(Path.of(dir, "_log")).isEmpty,
        "log entries leaked onto the filesystem past the store")
      assert(mem.size >= cur + 1)
      assert(MergeTable.readTable(spark, dir).count() == 50)
    }
  }

  test("injected CAS losses without a winner: the retry converges instead of wedging") {
    withStore("cs-casloss") { (dir, st, _) =>
      MergeTable.write(spark, table(50), "k", dir, nFiles = 2)
      // a conditional put can fail spuriously-losing (e.g. a raced 412
      // whose winner then crashed before its own staging was durable
      // is indistinguishable from a plain loss) — the writer's
      // recompute-and-retry loop must converge once the store accepts
      st.failCas.set(2)
      var committed = false
      var tries = 0
      while (!committed && tries < 10) {
        tries += 1
        try {
          MergeTable.merge(spark, dir,
            Seq((1L, "U", "RETRY", 1.0)).toDF("k", "op", "seg", "bal"), "k")
          committed = true
        } catch { case _: java.util.ConcurrentModificationException => () }
      }
      assert(committed, "writer wedged on injected CAS losses")
      assert(tries == 3, s"expected exactly 2 losses then success, took $tries")
      assert(MergeTable.committedGen(dir).contains(1))
      assert(MergeTable.readTable(spark, dir).filter(col("k") === 1L)
        .select("seg").as[String].head() == "RETRY")
    }
  }

  test("injected checkpoint/pointer write failures never fail or tear a commit") {
    withStore("cs-ckptfail") { (dir, st, _) =>
      val K = MergeTable.checkpointInterval
      MergeTable.write(spark, table(50), "k", dir, nFiles = 2)
      // every putReplace (rollup + pointer) dies through the first
      // interval boundary — commits must keep landing regardless
      st.failReplace.set(1000000)
      (1 to K + 2).foreach(i =>
        MergeTable.commitCarryForward(dir, Map("op" -> "carry", "i" -> i.toString)))
      assert(MergeTable.committedGen(dir).contains(K + 2),
        "a failed rollup write failed the commit itself")
      assert(MergeTable.lastCheckpointGen(dir).isEmpty,
        "a torn checkpoint published") // resolution is on the listing path
      assert(MergeTable.readTable(spark, dir).count() == 50)
      // writes healthy again: the NEXT interval boundary re-establishes
      // checkpointed resolution with no repair step
      st.failReplace.set(0)
      (1 to K).foreach(_ => MergeTable.commitCarryForward(dir, Map("op" -> "carry")))
      assert(MergeTable.lastCheckpointGen(dir).contains(2 * K))
      assert(MergeTable.committedGen(dir).contains(2 * K + 2))
    }
  }

  test("crash staging is invisible and swept: the data plane needs no store atomicity") {
    withStore("cs-crash") { (dir, _, _) =>
      MergeTable.write(spark, table(100), "k", dir, nFiles = 4)
      val before = MergeTable.readTable(spark, dir).count()
      // a predecessor died mid-merge: tokened staging dirs exist on the
      // filesystem, but no store CAS ever landed for generation 1
      Files.createDirectories(Path.of(dir, "files-g1~deadtok"))
      Files.write(Path.of(dir, "files-g1~deadtok", "garbage.parquet"),
        Array[Byte](1, 2, 3))
      Files.createDirectories(Path.of(dir, "manifest-g1~deadtok"))
      assert(MergeTable.committedGen(dir).contains(0), "crash leaked a commit")
      assert(MergeTable.readTable(spark, dir).count() == before,
        "reader saw uncommitted files")
      MergeTable.merge(spark, dir,
        Seq((1L, "D", null, 0.0)).toDF("k", "op", "seg", "bal"), "k")
      assert(MergeTable.committedGen(dir).contains(1))
      MergeTable.vacuum(spark, dir)
      assert(Files.notExists(Path.of(dir, "files-g1~deadtok")),
        "dead staging survived vacuum")
      assert(Files.notExists(Path.of(dir, "manifest-g1~deadtok")),
        "dead manifest survived vacuum")
      assert(MergeTable.readTable(spark, dir).count() == before - 1)
    }
  }

  test("governance version CAS converges under contention on the in-memory store") {
    import scala.jdk.CollectionConverters._
    withStore("cs-govern") { (dir, _, _) =>
      MergeTable.write(spark, table(50), "k", dir, nFiles = 2)
      val threads = 4
      val perThread = 5
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      (1 to threads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = try (1 to perThread).foreach { i =>
            MergeTable.addCheckConstraint(spark, dir, s"c_${t}_$i", "k > 0")
          } catch { case e: Throwable => failures.add(e) }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(failures.isEmpty,
        s"governance writers failed: ${failures.asScala.map(_.toString).toSeq}")
      val names = MergeTable.checkConstraints(dir).keySet
      val want = (for { t <- 1 to threads; i <- 1 to perThread }
        yield s"c_${t}_$i").toSet
      assert(names == want, s"lost governance updates: ${want -- names}")
      assert(Files.notExists(Path.of(dir, "_constraints-v1")),
        "governance version leaked onto the filesystem past the store")
    }
  }

  test("bloom sidecar publish flows through the store: build, fold, probe, rebuild, vacuum") {
    withStore("cs-bloom") { (dir, _, _) =>
      val rows = (1 to 400)
        .map(k => (k.toLong, f"tag-${(k * 2654435761L) % 1000003}%07d", k * 1.5))
        .toDF("k", "tag", "bal")
      def tagOf(k: Long) = f"tag-${(k * 2654435761L) % 1000003}%07d"
      MergeTable.write(spark, rows, "k", dir, nFiles = 8)
      assert(MergeTable.buildBloomIndex(spark, dir, "tag", numBits = 1 << 14) == 0)
      // the pointer is store-resident: NOTHING bloom-control-shaped on
      // the filesystem (the parquet data dir is, by design — data is
      // published by reference, like data files from manifests)
      assert(Files.notExists(Path.of(dir, "_bloomptr")),
        "bloom pointer leaked onto the filesystem past the store")
      assert(MergeTable.bloomIndexedColumns(dir) == Map("tag" -> 0))
      val (_, pruned0, total0) =
        MergeTable.bloomCandidatePaths(spark, dir, "tag", tagOf(333L))
      assert(total0 == 8 && pruned0 >= 6, s"no pruning: $pruned0/$total0")
      // a DML fold republishes through the store and supersedes gen 0
      MergeTable.merge(spark, dir,
        Seq((50L, "U", "fresh-tag", 0.5)).toDF("k", "op", "tag", "bal"), "k")
      assert(MergeTable.bloomIndexedColumns(dir) == Map("tag" -> 1))
      assert(MergeTable.scanEqualsBloom(spark, dir, "tag", "fresh-tag")
        .select("k").as[Long].collect().toSeq == Seq(50L))
      val (c1, _, _) =
        MergeTable.bloomCandidatePaths(spark, dir, "tag", "fresh-tag")
      assert(c1.size <= 2, s"fold did not cover the merge's file: $c1")
      // exactly one live data dir after the fold's sweep; vacuum keeps
      // the referenced one and the probes keep pruning after it
      def segDirs = PosixCommitStore.list(Path.of(dir))
        .filter(_.startsWith("_bloomseg-"))
      assert(segDirs.size == 1, s"superseded data dir survived: $segDirs")
      MergeTable.vacuum(spark, dir)
      assert(segDirs.size == 1, s"vacuum swept a referenced data dir: $segDirs")
      assert(MergeTable.scanEqualsBloom(spark, dir, "tag", tagOf(333L))
        .select("k").as[Long].collect().toSeq == Seq(333L))
      // full rebuild at the head generation supersedes through the
      // store too (same-name replace path included)
      assert(MergeTable.buildBloomIndex(spark, dir, "tag", numBits = 1 << 14) == 1)
      assert(MergeTable.buildBloomIndex(spark, dir, "tag", numBits = 1 << 14) == 1)
      assert(segDirs.size == 1, s"rebuild leaked data dirs: $segDirs")
      assert(MergeTable.bloomIndexedColumns(dir) == Map("tag" -> 1))
      assert(MergeTable.scanEqualsBloom(spark, dir, "tag", "fresh-tag")
        .select("k").as[Long].collect().toSeq == Seq(50L))
    }
  }

  test("horizons, vacuum guard and DV lifecycle all flow through the store") {
    withStore("cs-life") { (dir, _, _) =>
      MergeTable.write(spark, table(200), "k", dir, nFiles = 4)
      MergeTable.deleteKeys(spark, dir, "k", Seq(5L, 105L))
      assert(MergeTable.readTable(spark, dir).count() == 198)
      MergeTable.registerCdcHorizon(dir, "replica", 0)
      assert(MergeTable.cdcHorizons(dir) == Map("replica" -> 0))
      assert(MergeTable.cdcHorizonDetails(dir).get("replica").exists(_._2 > 0))
      assert(Files.notExists(Path.of(dir, "_cdc_horizon-replica")),
        "horizon leaked onto the filesystem past the store")
      // vacuum refuses while the horizon lags — the guard reads
      // through the store too
      val e = intercept[IllegalStateException] { MergeTable.vacuum(spark, dir) }
      assert(e.getMessage.contains("replica"))
      assert(MergeTable.releaseCdcHorizon(dir, "replica"))
      MergeTable.vacuum(spark, dir)
      assert(MergeTable.readTable(spark, dir).count() == 198)
      // post-vacuum: current generation still resolves and time travel
      // below it ends loudly, exactly the POSIX semantics
      assert(MergeTable.committedGen(dir).contains(1))
    }
  }
}
