package graft.pipeline

import graft.SparkSpecBase
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** [[Pipeline.writeShards]]: the physical shard files behind pp08's
  * manifest — files ≡ manifest, crash-safe commit, idempotent replay.
  */
class WriteShardsSpec extends SparkSpecBase {

  private def manifestRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("writeShards: files match the manifest exactly, one file per shard") {
    val out = tmpDir("graft-shards") + "/out"
    val manifest = manifestRows(Pipeline.writeShards(spark, sfDir, out))
    // the written manifest IS pp08's registered output
    assert(manifest == manifestRows(Pipeline.pp08_shard_pack(spark, sfDir)),
      "written manifest diverges from pp08_shard_pack")
    // the FILES agree with the manifest on counts and id bounds —
    // recomputed from the shard parquet itself, chars re-joined from
    // the corpus (shard files carry the payload, not the metadata)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "n_chars")
    val dataRoot = Pipeline.shardDataRoot(out).get
    val fromFiles = manifestRows(
      spark.read.parquet(s"$dataRoot/shards").join(docs, "doc_id")
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .select(col("shard").cast("long"), col("n_docs"), col("sum_chars"),
          col("min_id"), col("max_id")))
    assert(fromFiles == manifest, "shard files diverge from the manifest")
    // exactly one data file per shard directory (the repartition-on-
    // shard write contract a training reader relies on)
    import scala.jdk.CollectionConverters._
    val dirs = Files.list(Paths.get(s"$dataRoot/shards")).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("shard="))
    assert(dirs.size == manifest.size, s"${dirs.size} shard dirs vs ${manifest.size} manifest rows")
    dirs.foreach { dir =>
      val parts = Files.list(dir).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
      assert(parts.size == 1, s"$dir holds ${parts.size} files, expected 1")
    }
    // rows INSIDE a shard file keep the md5-permuted order, not
    // doc_id order — the property a sequential training reader needs
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val shard0 = spark.read.parquet(dirs.head.toString)
      .collect().map(_.getLong(0)).toSeq
    assert(shard0 == shard0.sortBy(id => (md5hex(id.toString), id)),
      "rows within a shard are not in permuted (global-rank) order")
    // a committed dir replays as a no-op: same manifest back, shard
    // files untouched (mtimes unchanged — nothing was rewritten)
    val mtimes = dirs.map(d => d.toString -> Files.getLastModifiedTime(d)).toMap
    val again = manifestRows(Pipeline.writeShards(spark, sfDir, out))
    assert(again == manifest)
    dirs.foreach(d => assert(Files.getLastModifiedTime(d) == mtimes(d.toString),
      s"replay rewrote committed shard dir $d"))
  }

  test("writeShardsOf: an empty curated frame commits a READABLE empty layout") {
    import spark.implicits._
    val out = tmpDir("shards-empty")
    // realistic on the curated path: an aggressive gate empties the
    // train set; the committed dir must still honor readShards'
    // contract (a zero-row partitioned write emits no schema-carrying
    // file at all)
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
    val manifest = Pipeline.writeShardsOf(spark, empty, out)
    assert(manifest.count() == 0)
    assert(Pipeline.shardDataRoot(out).isDefined, "empty build did not commit")
    assert(Pipeline.readShards(spark, out, 0L).count() == 0,
      "committed empty layout is not readable")
  }

  test("readShards: per-epoch deterministic reshuffle of a committed dir") {
    val out = tmpDir("graft-shards-read") + "/out"
    Pipeline.writeShards(spark, sfDir, out)
    def order(epoch: Long): Seq[Long] = {
      // collect() preserves the frame's partition-then-row order, so
      // this IS the stream order a training reader would consume
      val rows = Pipeline.readShards(spark, out, epoch).collect()
      rows.map(_.getLong(0)).toSeq
    }
    val e0 = order(0L)
    val e1 = order(1L)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    // same corpus every epoch — different order each epoch
    assert(e0.size.toLong == nDocs && e0.toSet == e1.toSet)
    assert(e0 != e1, "epochs 0 and 1 produced the same order")
    // an epoch replays bit-stable (no RNG anywhere)
    assert(order(1L) == e1, "epoch order is not deterministic")
    // an uncommitted dir is refused rather than half-read
    intercept[IllegalArgumentException] {
      Pipeline.readShards(spark, tmpDir("graft-not-committed"), 0L)
    }
  }

  test("writeShards: a mid-write crash replays to a complete committed output") {
    val root = tmpDir("graft-shards-crash")
    val out = root + "/out"
    // simulate every crash artifact the protocol (old and new) can
    // leave: a LEGACY partial staging dir (pre-r15 write died
    // mid-shard), a partial legacy output with no marker, an orphan
    // pointer-era segment (crash BEFORE the flip), and a dangling
    // marker whose segment is gone (segment swept mid-replay)
    Files.createDirectories(Paths.get(s"$out.staging/shards/shard=0"))
    Files.write(Paths.get(s"$out.staging/shards/shard=0/garbage"), "junk".getBytes)
    Files.createDirectories(Paths.get(s"$out/shards"))
    Files.write(Paths.get(s"$out/shards/partial"), "junk".getBytes)
    Files.createDirectories(Paths.get(s"$out/_shardseg-orphantok/shards/shard=0"))
    Files.write(Paths.get(s"$out/_shardseg-orphantok/shards/shard=0/garbage"),
      "junk".getBytes)
    Files.write(Paths.get(s"$out/_committed"), "_shardseg-gonetok\n".getBytes)
    // a dangling marker must read as UNCOMMITTED, loudly, not half-read
    assert(Pipeline.shardDataRoot(out).isEmpty)
    intercept[IllegalArgumentException] { Pipeline.readShards(spark, out, 0L) }
    val manifest = manifestRows(Pipeline.writeShards(spark, sfDir, out))
    assert(manifest == manifestRows(Pipeline.pp08_shard_pack(spark, sfDir)),
      "replay after crash produced a wrong manifest")
    assert(Files.exists(Paths.get(s"$out/_committed")), "replay did not commit")
    assert(!Files.exists(Paths.get(s"$out.staging")), "staging dir survived the commit")
    assert(!Files.exists(Paths.get(s"$out/shards/partial")),
      "partial pre-crash output leaked into the committed dir")
    val dataRoot = Pipeline.shardDataRoot(out).get
    assert(dataRoot != s"$out/_shardseg-orphantok",
      "replay resolved to the pre-crash orphan segment")
    assert(!Files.exists(Paths.get(s"$out/_shardseg-orphantok")),
      "orphan segment survived the replay sweep")
    // the files are complete: every corpus doc lands in exactly one shard
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    val shardDocs = spark.read.parquet(s"$dataRoot/shards")
    assert(shardDocs.count() == nDocs)
    assert(shardDocs.select("doc_id").distinct().count() == nDocs)
  }

  test("writeShards: legacy pre-pointer committed dirs still resolve and replay as no-ops") {
    val out = tmpDir("graft-shards-legacy") + "/out"
    // build a committed dir, then rewrite it into the LEGACY layout a
    // pre-r15 writeShards produced: data at the root, marker body
    // "committed"
    Pipeline.writeShards(spark, sfDir, out)
    val seg = Pipeline.shardDataRoot(out).get
    assert(seg != out && seg.contains("_shardseg-"))
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(from).iterator().asScala.foreach { p =>
        val t = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t) }
      }
    }
    copyTree(Paths.get(seg, "manifest"), Paths.get(out, "manifest"))
    copyTree(Paths.get(seg, "shards"), Paths.get(out, "shards"))
    graft.IndexLifecycle.deleteRecursively(seg)
    Files.write(Paths.get(out, "_committed"), "committed\n".getBytes)
    assert(Pipeline.shardDataRoot(out).contains(out))
    // a replay is a no-op returning the legacy manifest, and the
    // legacy reader path works
    val manifest = manifestRows(Pipeline.writeShards(spark, sfDir, out))
    assert(manifest == manifestRows(Pipeline.pp08_shard_pack(spark, sfDir)))
    assert(Files.exists(Paths.get(out, "shards")), "replay rewrote a legacy dir")
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(Pipeline.readShards(spark, out, 0L).count() == nDocs)
  }

  test("writeShards: a corrupted marker body reads as UNCOMMITTED, not as the legacy root form") {
    val out = tmpDir("graft-shards-corrupt") + "/out"
    Pipeline.writeShards(spark, sfDir, out)
    // corrupt the marker: neither a resolvable _shardseg- pointer nor
    // the exact legacy body "committed" — an empty body and a garbage
    // body must BOTH read as unresolvable (pre-r16 the legacy branch
    // swallowed them and routed readers at the root)
    for (body <- Seq("", "comitted junk", "_shardseg ")) {
      Files.write(Paths.get(s"$out/_committed"), body.getBytes("UTF-8"))
      assert(Pipeline.shardDataRoot(out).isEmpty,
        s"corrupted marker body '$body' resolved instead of reading uncommitted")
      intercept[IllegalArgumentException] { Pipeline.readShards(spark, out, 0L) }
    }
    // and a replay heals it: full rewrite, fresh pointer, readable
    val manifest = manifestRows(Pipeline.writeShards(spark, sfDir, out))
    assert(manifest == manifestRows(Pipeline.pp08_shard_pack(spark, sfDir)))
    assert(Pipeline.shardDataRoot(out).exists(_.contains("_shardseg-")))
  }

  test("writeShards: the pointer flip rides a registered CommitStore (crash on either side is consistent)") {
    val out = tmpDir("graft-shards-store") + "/out"
    val store = new graft.operators.InMemoryCommitStore
    graft.operators.CommitStore.register(out, store)
    try {
      val manifest = manifestRows(Pipeline.writeShards(spark, sfDir, out))
      // the marker lives in the STORE, not on the filesystem — the
      // object-store deployment shape (one conditional PUT, no rename)
      assert(Files.notExists(Paths.get(out, "_committed")),
        "marker leaked onto the filesystem past the store")
      assert(Pipeline.shardDataRoot(out).exists(_.contains("_shardseg-")))
      assert(Pipeline.readShards(spark, out, 0L).count() ==
        graft.Tables.documents(spark, sfDir).count())
      // crash AFTER the flip: the artifact is complete — a replay is a
      // pure no-op (marker resolves, nothing rewritten)
      assert(manifestRows(Pipeline.writeShards(spark, sfDir, out)) == manifest)
      // crash BEFORE the flip, modeled exactly: delete the pointer and
      // leave the segment — the dir reads as uncommitted (old state),
      // never as a half-published artifact, and a replay recommits
      val seg0 = Pipeline.shardDataRoot(out).get
      store.delete(Paths.get(out, "_committed"))
      assert(Pipeline.shardDataRoot(out).isEmpty)
      intercept[IllegalArgumentException] { Pipeline.readShards(spark, out, 0L) }
      assert(manifestRows(Pipeline.writeShards(spark, sfDir, out)) == manifest)
      val seg1 = Pipeline.shardDataRoot(out).get
      assert(seg1 != seg0, "replay resurrected the unpublished segment")
      assert(!Files.exists(Paths.get(seg0)), "unpublished segment not swept")
    } finally graft.operators.CommitStore.unregister(out)
  }
}
