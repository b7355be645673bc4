package graft.sources

import graft.SparkSpecBase
import graft.operators.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MergeTable change feed as a Structured Streaming source:
  * generation-per-micro-batch delivery, checkpointed exactly-once
  * across restarts, catch-up spans as net diffs, and the flagship
  * composition — streaming table replication by applying the feed
  * with merge() on the other side.
  */
class CdcSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshTable(n: Int): String = {
    val dir = tmpDir("cdc-src-tbl")
    val src = (1 to n).map(k => (k.toLong, s"seg${k % 5}", k * 1.5))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, src, "k", dir, nFiles = 4)
    dir
  }

  private def mergeBatch(dir: String, rows: Seq[(Long, String, String, Double)]): Unit =
    MergeTable.merge(spark, dir,
      rows.toDF("k", "op", "seg", "bal"), "k")

  test("each committed generation arrives as one exactly-once micro-batch") {
    val dir = freshTable(100)
    val ckpt = tmpDir("cdc-src-ckpt")
    // foreachBatch collector: unlike the memory sink it supports
    // checkpoint recovery, so the restart leg below is the real thing
    val seen = new scala.collection.mutable.ArrayBuffer[(Long, String, Long, Double)]
    def start() = MergeTable.changesStream(spark, dir, "k")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (delta: DataFrame, _: Long) =>
        val rows = delta.collect().map(r => (r.getAs[Long]("k"),
          r.getAs[String]("change_op"), r.getAs[Long]("_commit_gen"),
          r.getAs[Double]("bal")))
        seen.synchronized { seen ++= rows }; ()
      }.start()

    val q = start()
    try {
      q.processAllAvailable() // baseline gen 0: nothing after startGen=0
      assert(seen.isEmpty)

      mergeBatch(dir, Seq((1L, "U", "WEB", 9.9), (200L, "I", "NEW", 1.0),
        (2L, "D", null, 0.0)))
      q.processAllAvailable()
      val b1 = seen.synchronized(seen.map(t => (t._1, t._2, t._3)).sorted.toSeq)
      assert(b1 == Seq((1L, "U", 1L), (2L, "D", 1L), (200L, "I", 1L)))
      // D carries the pre-image, I/U the post-image
      val byK = seen.synchronized(seen.map(t => t._1 -> t._4).toMap)
      assert(byK(1L) == 9.9 && byK(200L) == 1.0 && byK(2L) == 3.0)

      mergeBatch(dir, Seq((3L, "U", "API", 7.0)))
      q.processAllAvailable()
      val gens = seen.synchronized(seen.map(_._3).toSeq)
      assert(gens.count(_ == 2L) == 1 && gens.size == 4)
    } finally q.stop()

    // restart on the SAME checkpoint: no re-delivery of gens 1-2,
    // the merge that happened while the stream was down flows
    mergeBatch(dir, Seq((4L, "D", null, 0.0)))
    val before = seen.size
    val q2 = start()
    try {
      q2.processAllAvailable()
      val after = seen.synchronized(seen.drop(before).map(t => (t._1, t._2, t._3)).toSeq)
      assert(after == Seq((4L, "D", 3L)),
        s"restart must deliver exactly the missed generation, got ${after.toList}")
    } finally q2.stop()
  }

  test("a catch-up span nets out to the logical diff with one batch") {
    val dir = freshTable(50)
    // three generations while no stream is running: insert→update,
    // and an insert→delete that must net to NOTHING
    mergeBatch(dir, Seq((300L, "I", "A", 1.0), (301L, "I", "B", 1.0)))
    mergeBatch(dir, Seq((300L, "U", "A2", 2.0)))
    mergeBatch(dir, Seq((301L, "D", null, 0.0)))
    val q = MergeTable.changesStream(spark, dir, "k")
      .writeStream.format("memory").queryName("cdcspan")
      .option("checkpointLocation", tmpDir("cdc-span-ckpt")).start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdcspan").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_op"),
          r.getAs[String]("seg"), r.getAs[Long]("_commit_gen"))).toSeq
      assert(got == Seq((300L, "I", "A2", 3L)),
        s"span should net to one insert with the final image, got ${got.toList}")
    } finally q.stop()
  }

  test("streaming replication: applying the feed reproduces the table") {
    val dir = freshTable(200)
    val replica = tmpDir("cdc-replica")
    // bootstrap: snapshot at the stream's startGen baseline
    MergeTable.write(spark, MergeTable.readTable(spark, dir, asOf = Some(0)),
      "k", replica, nFiles = 4)
    val q = MergeTable.changesStream(spark, dir, "k")
      .writeStream.option("checkpointLocation", tmpDir("cdc-rep-ckpt"))
      .foreachBatch { (delta: DataFrame, _: Long) =>
        val changes = delta.withColumnRenamed("change_op", "op")
          .drop("_commit_gen")
        if (!changes.isEmpty) { MergeTable.merge(spark, replica, changes, "k"); () }
      }.start()
    try {
      mergeBatch(dir, Seq((10L, "U", "HOT", 0.5), (999L, "I", "NEW", 3.3)))
      q.processAllAvailable()
      mergeBatch(dir, Seq((999L, "D", null, 0.0), (11L, "U", "COLD", 0.1)))
      q.processAllAvailable()
      val want = MergeTable.readTable(spark, dir)
        .orderBy("k").collect().map(_.toSeq).toSeq
      val got = MergeTable.readTable(spark, replica)
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(got == want, "replica diverged from source table")
    } finally q.stop()
  }

  test("a RESTORE arrives through the stream as its net inverse delta") {
    val dir = freshTable(60)
    val q = MergeTable.changesStream(spark, dir, "k")
      .writeStream.format("memory").queryName("cdcrestore")
      .option("checkpointLocation", tmpDir("cdc-restore-ckpt")).start()
    try {
      mergeBatch(dir, Seq((3L, "U", "HOT", 0.5), (900L, "I", "NEW", 1.0),
        (4L, "D", null, 0.0)))
      q.processAllAvailable()
      // the rollback is just another commit to a tailing consumer —
      // delivered as the inverse of the churn, no special-casing
      MergeTable.restore(spark, dir, 0)
      q.processAllAvailable()
      val inv = spark.table("cdcrestore")
        .filter(col("_commit_gen") === 2L).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_op"),
          r.getAs[Double]("bal"))).sortBy(_._1).toSeq
      // U reverts to the original image, D resurrects it, I retracts
      assert(inv == Seq((3L, "U", 4.5), (4L, "I", 6.0), (900L, "D", 1.0)),
        s"restore delta wrong: $inv")
    } finally q.stop()
  }

  test("snapshot mode: first batch is the whole table as inserts, deltas follow") {
    val dir = freshTable(30)
    mergeBatch(dir, Seq((5L, "U", "PRE", 1.0))) // gen 1 before the stream exists
    val q = MergeTable.changesStream(spark, dir, "k", startGen = -1)
      .writeStream.format("memory").queryName("cdcsnap")
      .option("checkpointLocation", tmpDir("cdc-snap-ckpt")).start()
    try {
      q.processAllAvailable()
      val snap = spark.table("cdcsnap").collect()
      assert(snap.length == 30 && snap.forall(_.getAs[String]("change_op") == "I"))
      // the snapshot is AS OF the then-committed generation: the
      // pre-stream update is already folded in, not replayed
      assert(snap.forall(_.getAs[Long]("_commit_gen") == 1L))
      assert(snap.find(_.getAs[Long]("k") == 5L).get.getAs[String]("seg") == "PRE")
      mergeBatch(dir, Seq((6L, "D", null, 0.0)))
      q.processAllAvailable()
      val next = spark.table("cdcsnap").collect().filter(_.getAs[Long]("_commit_gen") == 2L)
      assert(next.map(r => (r.getAs[Long]("k"), r.getAs[String]("change_op"))).toSeq
        == Seq((6L, "D")))
    } finally q.stop()
  }

  test("governed ingest: the CDC feed drives a dedup-gated store; deletes become takedowns") {
    import graft.dedup.Dedup
    import graft.Tables
    // corpus = a MergeTable of (doc_id, text); its CDC feed drives the
    // derived state a training pipeline keeps: a near-dup-gated
    // document store + the LSH index that does the gating. Inserts
    // gate-then-append; DELETES become index takedowns, so content
    // removed from the corpus is immediately re-admittable — the
    // composition MergeTable + graft-cdc + dd11/dd14 exists for.
    val base = Tables.documents(spark, sfDir)
      .orderBy(length(col("text")).desc).limit(40).select("doc_id", "text")
      .cache()
    val corpus = tmpDir("cdc-ing-corpus")
    MergeTable.write(spark, base, "doc_id", corpus, nFiles = 2)
    val donor = base.orderBy(col("doc_id")).first()
    val donorId = donor.getAs[Long]("doc_id")
    val donorText = donor.getAs[String]("text")

    val idxTbl = tmpDir("cdc-ing-idx") // index handle IS its root dir
    Dedup.buildLshIndexFrom(base, idxTbl)
    val store = tmpDir("cdc-ing-store")

    val q = MergeTable.changesStream(spark, corpus, "doc_id")
      .writeStream.option("checkpointLocation", tmpDir("cdc-ing-ckpt"))
      .foreachBatch { (delta: DataFrame, _: Long) =>
        val dels = delta.filter(col("change_op") === "D").select("doc_id")
        if (!dels.isEmpty) Dedup.tombstoneDocs(spark, idxTbl, dels)
        val ups = delta.filter(col("change_op") =!= "D").select("doc_id", "text")
        if (!ups.isEmpty) {
          val sigs = Dedup.sigsOf(ups)
          val dupes = Dedup.neardupDelta(spark, sigs, idxTbl, 0.5,
              Some(Dedup.tombstonesOf(spark, idxTbl)))
            .select(col("delta_id").as("doc_id")).distinct()
          val admitted = ups.join(dupes, Seq("doc_id"), "left_anti")
            .localCheckpoint()
          if (!admitted.isEmpty) {
            admitted.write.mode("append").parquet(store)
            Dedup.appendToLshIndex(spark, idxTbl, Dedup.sigsOf(admitted))
          }
        }
        ()
      }.start()
    def storedIds(): Set[Long] =
      if (new java.io.File(store).list().exists(_.endsWith(".parquet")))
        spark.read.parquet(store).select("doc_id").collect()
          .map(_.getLong(0)).toSet
      else Set.empty
    try {
      // batch 1: a near-copy of the donor doc (gated) + a genuinely
      // novel doc (admitted)
      MergeTable.merge(spark, corpus, Seq(
        (1000001L, "I", donorText + " extra"),
        (1000002L, "I", "qwxz vbnk plomr strak quuz flembic dorvat ninble")
      ).toDF("doc_id", "op", "text"), "doc_id")
      q.processAllAvailable()
      assert(storedIds() == Set(1000002L),
        s"near-copy must be gated, novel doc admitted: ${storedIds()}")

      // batch 2: the donor is DELETED from the corpus → takedown
      MergeTable.merge(spark, corpus,
        Seq((donorId, "D", null: String)).toDF("doc_id", "op", "text"), "doc_id")
      q.processAllAvailable()
      assert(Dedup.tombstonesOf(spark, idxTbl).collect()
        .map(_.getLong(0)).toSet == Set(donorId))

      // batch 3: the same content arrives again — now admissible,
      // because its only near-dup was taken down
      MergeTable.merge(spark, corpus, Seq(
        (1000003L, "I", donorText + " extra")
      ).toDF("doc_id", "op", "text"), "doc_id")
      q.processAllAvailable()
      assert(storedIds() == Set(1000002L, 1000003L),
        s"taken-down content must be re-admittable: ${storedIds()}")
    } finally {
      q.stop()
      base.unpersist()
      scala.util.Try(graft.IndexLifecycle.deleteRecursively(idxTbl))
    }
  }

  test("governed ANN ingest: the CDC feed drives the IVF index (appends + takedowns)") {
    import graft.similarity.Similarity
    import graft.Tables
    import spark.implicits._
    // embeddings corpus = a MergeTable; its CDC feed keeps the IVF
    // index current: inserts append to cells, corpus DELETEs become
    // vector tombstones — the ANN twin of the dedup-gated ingest
    // composition above (no probe ever re-reads the corpus)
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val corpus = tmpDir("cdc-ann-corpus")
    MergeTable.write(spark, emb, "vec_id", corpus, nFiles = 2)
    val ix = tmpDir("cdc-ann-ix")
    Similarity.buildIvfIndex(spark, sfDir, ix, nCells = 8)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val newId = maxId + 1

    val q = MergeTable.changesStream(spark, corpus, "vec_id")
      .writeStream.option("checkpointLocation", tmpDir("cdc-ann-ckpt"))
      .foreachBatch { (delta: DataFrame, _: Long) =>
        val dels = delta.filter(col("change_op") === "D").select("vec_id")
        if (!dels.isEmpty) Similarity.tombstoneVectors(spark, ix, dels)
        val ins = delta.filter(col("change_op") === "I")
          .select("vec_id", "embedding")
        if (!ins.isEmpty) Similarity.appendToIvfIndex(spark, ix, ins)
        ()
      }.start()
    try {
      q.processAllAvailable() // baseline: index already covers gen 0

      // gen 1: a duplicate of vector 3 arrives under a fresh id — the
      // streamed append must make it probeable
      MergeTable.merge(spark, corpus,
        emb.filter(col("vec_id") === 3L)
          .select(lit(newId).as("vec_id"), lit("I").as("op"), col("embedding")),
        "vec_id")
      q.processAllAvailable()
      val qdf = emb.filter(col("vec_id") === 3L)
        .select(lit(-1L).as("q_id"),
          col("embedding").cast("array<double>").as("va"))
        .withColumn("na", graft.functions.GraftFunctions.l2norm("va"))
      val top = Similarity.probeIvf(spark, ix, qdf, nProbe = 8, k = 10)
        .select("n_id").as[Long].collect().toSet
      assert(top.contains(newId), s"streamed append not probeable: $top")

      // gen 2: the duplicate is DELETED from the corpus → takedown
      // binds on the probe path without touching the cells
      MergeTable.merge(spark, corpus,
        Seq(newId).toDF("vec_id").select(col("vec_id"), lit("D").as("op"),
          lit(null).cast("array<float>").as("embedding")), "vec_id")
      q.processAllAvailable()
      val top2 = Similarity.probeIvf(spark, ix, qdf, nProbe = 8, k = 10)
        .select("n_id").as[Long].collect().toSet
      assert(!top2.contains(newId), s"taken-down vector still probeable: $top2")
      assert(top2.contains(3L), "untouched residents must stay probeable")
    } finally q.stop()
  }

  test("mid-stream schema evolution: the fixed stream schema holds, new columns wait for restart") {
    val dir = freshTable(20)
    val q = MergeTable.changesStream(spark, dir, "k")
      .writeStream.format("memory").queryName("cdcevo")
      .option("checkpointLocation", tmpDir("cdc-evo-ckpt")).start()
    try {
      // the corpus evolves (adds `tier`) while the stream runs: the
      // delta aligns to the schema fixed at stream start (tier
      // dropped, omitted bal null on the insert) instead of breaking
      MergeTable.merge(spark, dir, Seq((1L, "U", "WEB", "gold"),
        (900L, "I", "NEW", "silver")).toDF("k", "op", "seg", "tier"), "k")
      q.processAllAvailable()
      val rows = spark.table("cdcevo").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_op"),
          r.getAs[String]("seg"), r.getAs[Any]("bal"))).sortBy(_._1).toSeq
      assert(spark.table("cdcevo").columns.toSeq ==
        Seq("k", "change_op", "_commit_gen", "seg", "bal"))
      assert(rows == Seq((1L, "U", "WEB", 1.5), (900L, "I", "NEW", null)))
    } finally q.stop()
    // a NEW stream sees the evolved schema
    assert(MergeTable.changesStream(spark, dir, "k").schema.fieldNames.toSeq ==
      Seq("k", "change_op", "_commit_gen", "seg", "bal", "tier"))
  }

  test("a stream whose checkpoint horizon was vacuumed fails loudly, not wrongly") {
    val dir = freshTable(40)
    val ckpt = tmpDir("cdc-vac-ckpt")
    val seen = new scala.collection.mutable.ArrayBuffer[Long]
    def start() = MergeTable.changesStream(spark, dir, "k")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (delta: DataFrame, _: Long) =>
        val gens = delta.select("_commit_gen").distinct().collect().map(_.getLong(0))
        seen.synchronized { seen ++= gens }; ()
      }.start()
    val q = start()
    try {
      mergeBatch(dir, Seq((1L, "U", "A", 1.0)))
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == Set(1L))
    } finally q.stop()
    // two more generations land while the stream is down. The stream
    // REGISTERED its retention horizon at start, so a default vacuum
    // now refuses, naming the consumer — the stranding can no longer
    // happen silently
    mergeBatch(dir, Seq((2L, "U", "B", 2.0)))
    mergeBatch(dir, Seq((3L, "U", "C", 3.0)))
    val hs = MergeTable.cdcHorizons(dir)
    assert(hs.size == 1 && hs.keys.head.startsWith("stream-") &&
      hs.values.head < 3, s"stream horizon not registered: $hs")
    val refused = intercept[IllegalStateException] {
      MergeTable.vacuum(spark, dir)
    }
    assert(refused.getMessage.contains(hs.keys.head) &&
      refused.getMessage.contains("force"), refused.getMessage)
    // a FORCED vacuum drops every non-current manifest — the stream's
    // checkpoint horizon is gone, knowingly
    MergeTable.vacuum(spark, dir, force = true)
    val q2 = start()
    val failed =
      try { q2.processAllAvailable(); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
      finally scala.util.Try(q2.stop())
    assert(failed, "replay past a vacuumed horizon must surface an error")
    // and nothing wrong was delivered
    assert(seen.synchronized(seen.toSet) == Set(1L))
  }

  test("retention horizons ride the engine's commits; a caught-up stream never blocks vacuum") {
    val dir = freshTable(40)
    val ckpt = tmpDir("cdc-hz-ckpt")
    def start() = MergeTable.changesStream(spark, dir, "k")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((_: DataFrame, _: Long) => ()).start()
    val q = start()
    try {
      mergeBatch(dir, Seq((1L, "U", "A", 1.0)))
      q.processAllAvailable()
      mergeBatch(dir, Seq((2L, "U", "B", 2.0)))
      q.processAllAvailable()
      // the engine source-commits span [0,1] while constructing span
      // [1,2], so the horizon sits at 1: span [1,2]'s replay is still
      // possible until ITS commit hook fires — the horizon trails the
      // newest span EXACTLY, no further (getBatch alone would leave
      // it at the span start)
      val hs = MergeTable.cdcHorizons(dir)
      assert(hs.size == 1 && hs.values.head == 1,
        s"horizon should trail by exactly the uncommitted span: $hs")
      // and a vacuum now would genuinely strand that replay: refusal
      // is honest conservatism, naming the stream
      val ex = intercept[IllegalStateException] { MergeTable.vacuum(spark, dir) }
      assert(ex.getMessage.contains(hs.keys.head))
      // the next cycle source-commits [1,2]; the horizon follows to 2
      mergeBatch(dir, Seq((3L, "U", "C", 3.0)))
      q.processAllAvailable()
      assert(MergeTable.cdcHorizons(dir).values.head == 2,
        s"commit hook did not advance the horizon: ${MergeTable.cdcHorizons(dir)}")
    } finally q.stop()
    // a restart must NOT regress the horizon to its startGen option
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(MergeTable.cdcHorizons(dir).values.head >= 2,
        s"restart regressed the horizon: ${MergeTable.cdcHorizons(dir)}")
    } finally q2.stop()
    // released consumers stop gating; double release reports false
    val consumer = MergeTable.cdcHorizons(dir).keys.head
    assert(MergeTable.releaseCdcHorizon(dir, consumer))
    assert(!MergeTable.releaseCdcHorizon(dir, consumer), "double release")
    assert(MergeTable.vacuum(spark, dir) >= 0)
    // a CURRENT consumer (horizon == committed gen) never blocks
    MergeTable.registerCdcHorizon(dir, "replica-8",
      MergeTable.committedGen(dir).get)
    assert(MergeTable.vacuum(spark, dir) == 0)
  }

  test("vacuumRetaining reclaims around a lagging consumer without stranding it") {
    val dir = freshTable(40)                   // gen 0
    mergeBatch(dir, Seq((1L, "U", "A", 1.0)))  // gen 1
    MergeTable.registerCdcHorizon(dir, "replica-r", 1)
    mergeBatch(dir, Seq((2L, "U", "B", 2.0)))  // gen 2
    mergeBatch(dir, Seq((3L, "U", "C", 3.0)))  // gen 3
    // plain vacuum refuses (sweeping would strand the replica);
    // retention-aware reclaims exactly what nothing registered needs
    intercept[IllegalStateException] { MergeTable.vacuum(spark, dir) }
    assert(MergeTable.vacuumRetaining(spark, dir) > 0, "nothing reclaimed")
    // pre-horizon state is gone: time travel to gen 0 ends loudly
    intercept[Exception] { MergeTable.manifestAt(spark, dir, 0).collect() }
    // the consumer's replay span still works END TO END, exactly —
    // including the superseded pre-image files its diff must open
    val replay = MergeTable.changesBetween(spark, dir, 1, 3, "k")
      .select("k", "change_op").as[(Long, String)].collect().toSeq.sorted
    assert(replay == Seq((2L, "U"), (3L, "U")), s"replay broken: $replay")
    // intermediate manifests (possible future span endpoints) survive
    assert(MergeTable.manifestAt(spark, dir, 2).collect().nonEmpty)
    assert(MergeTable.readTable(spark, dir).count() == 40)
    // once the consumer catches up, retaining ≡ plain vacuum
    MergeTable.registerCdcHorizon(dir, "replica-r", 3)
    MergeTable.vacuumRetaining(spark, dir)
    assert(scala.util.Try(MergeTable.manifestAt(spark, dir, 1)).isFailure,
      "caught-up retention should sweep the old span")
    assert(MergeTable.readTable(spark, dir).count() == 40)
  }

  test("schema is keyCol, change_op, _commit_gen, then value columns") {
    val dir = freshTable(10)
    val s = MergeTable.changesStream(spark, dir, "k").schema
    assert(s.fieldNames.toSeq == Seq("k", "change_op", "_commit_gen", "seg", "bal"))
    assert(MergeTable.changesStream(spark, dir, "k").isStreaming)
  }

  test("startGen=latest: follow-only — history skipped, new commits flow") {
    val dir = freshTable(40)
    mergeBatch(dir, Seq((1L, "U", "OLD", 1.0))) // history before the stream
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).option("keyCol", "k")
      .option("startGen", "latest").load()
      .writeStream.format("memory").queryName("cdclatest")
      .option("checkpointLocation", tmpDir("cdc-latest-ckpt")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdclatest").isEmpty,
        "latest mode must not replay pre-stream history")
      mergeBatch(dir, Seq((2L, "U", "NEW", 2.0)))
      q.processAllAvailable()
      val got = spark.table("cdclatest").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_op"))).toSeq
      assert(got == Seq((2L, "U")), s"latest mode missed the live commit: $got")
    } finally q.stop()
  }

  test("malformed startGen option fails with a descriptive message, not a parse crash") {
    val ok = CdcSource.options(Map("path" -> "/t", "keycol" -> "k",
      "startgen" -> "snapshot"))
    assert(ok == (("/t", "k", -1, false)))
    assert(CdcSource.options(Map("path" -> "/t", "keycol" -> "k",
      "startgen" -> "latest")) == (("/t", "k", CdcSource.Latest, false)))
    assert(CdcSource.options(Map("path" -> "/t", "keycol" -> "k",
      "preImages" -> "true")) == (("/t", "k", 0, true)))
    val e = intercept[IllegalArgumentException] {
      CdcSource.options(Map("path" -> "/t", "keycol" -> "k",
        "startgen" -> "newest"))
    }
    assert(e.getMessage.contains("startGen") && e.getMessage.contains("newest"))
    val e2 = intercept[IllegalArgumentException] {
      CdcSource.options(Map("path" -> "/t", "keycol" -> "k",
        "preimages" -> "yep"))
    }
    assert(e2.getMessage.contains("preImages") && e2.getMessage.contains("yep"))
  }

  test("a generation span past Int range fails loudly instead of wrapping") {
    val dir = freshTable(10)
    val src = new CdcSource(spark.sqlContext, dir, "k", startGen = 0)
    val e = intercept[IllegalArgumentException] {
      src.getBatch(None,
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(Int.MaxValue.toLong + 1))
    }
    assert(e.getMessage.contains("Int"))
  }

  test("snapshot attach registers the head once; a restart never raises the horizon") {
    // first attach on a table already at generation 2: the horizon
    // registers AT the head (not 0), so an idle table's vacuum is
    // never blocked by generations no replay can need
    val dir = freshTable(40)
    mergeBatch(dir, Seq((1L, "U", "A", 1.0)))
    mergeBatch(dir, Seq((2L, "U", "B", 2.0)))
    val ckpt = tmpDir("cdc-snap-hz-ckpt")
    def start() = MergeTable.changesStream(spark, dir, "k", startGen = -1)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((_: DataFrame, _: Long) => ()).start()
    val q = start()
    try q.processAllAvailable() finally q.stop()
    val consumer = MergeTable.cdcHorizons(dir).keys
      .find(_.startsWith("stream-")).get
    assert(MergeTable.cdcHorizons(dir)(consumer) == 2,
      s"snapshot attach should hold the head: ${MergeTable.cdcHorizons(dir)}")
    MergeTable.vacuum(spark, dir) // caught-up snapshot never blocks
    // simulate the WAL-logged-but-uncommitted window: the engine will
    // replay the old span after restart, so the surviving (lower)
    // horizon entry must NOT be raised by createSource re-resolving
    // against the new head. Drive createSource DIRECTLY: a full
    // engine restart immediately re-fires the floor for its restored
    // COMMITTED batch (correct — that span can no longer replay
    // lower), which would mask what this pins.
    val metaPath = tmpDir("cdc-snap-hz-meta")
    val provider = new CdcSourceProvider
    val params = Map("path" -> dir, "keyCol" -> "k", "startGen" -> "snapshot")
    provider.createSource(spark.sqlContext, metaPath, None, "graft-cdc", params)
    val unitConsumer = CdcSource.consumerId(metaPath)
    assert(MergeTable.cdcHorizons(dir)(unitConsumer) == 2,
      "first attach should register the head")
    MergeTable.registerCdcHorizon(dir, unitConsumer, 0) // pending replay state
    provider.createSource(spark.sqlContext, metaPath, None, "graft-cdc", params)
    assert(MergeTable.cdcHorizons(dir)(unitConsumer) == 0,
      s"re-attach raised a replay-protecting horizon: ${MergeTable.cdcHorizons(dir)}")
    MergeTable.releaseCdcHorizon(dir, unitConsumer)
  }

  test("a crashed horizon registration never becomes a phantom consumer") {
    // PosixCommitStore.putReplace stages `_cdc_horizon-<c>.tmp-<pid>-
    // <nanos>` before the atomic move; a crash between the two leaves
    // debris whose name matches the `_cdc_horizon-` prefix AND whose
    // body parses as a valid generation. Pre-fix, cdcHorizons reported
    // it as a live consumer frozen at that generation, so plain
    // vacuum() refused FOREVER — and the refusal throws before the
    // crash-staging sweep that would have cleaned the debris, so the
    // table could never self-heal.
    val dir = freshTable(30)
    mergeBatch(dir, Seq((1L, "U", "Z", 9.9))) // gen 1 > any stale horizon
    val debris = java.nio.file.Path.of(dir,
      "_cdc_horizon-replica.tmp-12345-deadbeef")
    java.nio.file.Files.write(debris, "0\n".getBytes("UTF-8"))
    assert(MergeTable.cdcHorizons(dir).isEmpty,
      s"staging debris parsed as a consumer: ${MergeTable.cdcHorizons(dir)}")
    // plain vacuum proceeds AND reclaims the debris in the same pass
    assert(MergeTable.vacuum(spark, dir) >= 1)
    assert(java.nio.file.Files.notExists(debris),
      "vacuum's crash-staging sweep missed the horizon debris")
    // real registrations still work beside (former) debris...
    MergeTable.registerCdcHorizon(dir, "replica",
      MergeTable.committedGen(dir).get)
    assert(MergeTable.cdcHorizons(dir).keySet == Set("replica"))
    // ...a consumer id that merely CONTAINS `.tmp-` is a real
    // registration (debris is the EXACT `.tmp-<pid>-<hexnanos>` nonce
    // shape, nothing looser): visible, vacuum-guarding, never swept
    MergeTable.registerCdcHorizon(dir, "nightly.tmp-replica", 0)
    assert(MergeTable.cdcHorizons(dir).keySet ==
      Set("replica", "nightly.tmp-replica"),
      s".tmp--containing id dropped: ${MergeTable.cdcHorizons(dir)}")
    intercept[IllegalStateException] { MergeTable.vacuum(spark, dir) }
    MergeTable.vacuum(spark, dir, force = true)
    assert(MergeTable.cdcHorizons(dir).keySet ==
      Set("replica", "nightly.tmp-replica"),
      "vacuum swept a live .tmp--containing registration as debris")
    MergeTable.releaseCdcHorizon(dir, "nightly.tmp-replica")
    // ...and a consumer id that WOULD masquerade as staging (full
    // nonce shape) is refused at registration, not silently dropped
    // at listing
    intercept[IllegalArgumentException] {
      MergeTable.registerCdcHorizon(dir, "bad.tmp-12345-deadbeef", 0)
    }
    MergeTable.releaseCdcHorizon(dir, "replica")
  }
}
