package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC pre-images + incremental view maintenance: the preImages fan
  * shape, delta maintenance vs recomputation across generations, SQL
  * null/empty-group semantics under retraction, the persisted view's
  * refresh/idempotence, and streaming maintenance end to end.
  */
class IncrementalViewSpec extends SparkSpecBase {
  import spark.implicits._

  private def table(n: Int) =
    (1 to n).map(k => (k.toLong, s"seg${k % 4}", k * 1.5)).toDF("k", "seg", "bal")

  // bal is double in the fixtures; the maintained sum runs in the
  // decimal exactness regime IncrementalView enforces (raw double
  // sums are rejected — see the regime tests below)
  private val spec = IncrementalView.ViewSpec(Seq("seg"),
    Seq("sb" -> "cast(bal as decimal(28,6))"))

  /** (seg, count, sum, nn) rows sorted — bal values are exact binary
    * halves, representable exactly in decimal(28,6), so sums compare
    * exactly regardless of association.
    */
  private def rowsOf(df: DataFrame): Seq[(String, Long, Option[Double], Long)] =
    df.select(col("seg"), col("mv_count"), col("sb"), col("__nn_sb"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDecimal(2).doubleValue()), r.getLong(3)))
      .toSeq.sortBy(r => Option(r._1).getOrElse(""))

  test("changesBetween preImages fans U into U_pre/U_post, leaves I/D alone") {
    val dir = tmpDir("cdcpre")
    MergeTable.write(spark, table(200), "k", dir, nFiles = 4)
    val changes = Seq(
      (10L, "U", "WEB", 999.0), (20L, "D", null, 0.0), (5000L, "I", "NEW", 1.0)
    ).toDF("k", "op", "seg", "bal")
    MergeTable.merge(spark, dir, changes, "k")

    val plain = MergeTable.changesBetween(spark, dir, 0, 1, "k")
      .select("k", "change_op", "seg", "bal")
      .as[(Long, String, String, Double)].collect().sortBy(r => (r._1, r._2))
    val pre = MergeTable.changesBetween(spark, dir, 0, 1, "k", preImages = true)
      .select("k", "change_op", "seg", "bal")
      .as[(Long, String, String, Double)].collect().sortBy(r => (r._1, r._2))

    // the U key arrives as retract-then-assert with exact images
    assert(pre.filter(_._1 == 10L).toSeq == Seq(
      (10L, "U_post", "WEB", 999.0), (10L, "U_pre", "seg2", 15.0))
      .sortBy(r => (r._1, r._2)))
    // I and D rows are byte-identical between the two shapes
    assert(pre.filter(r => r._2 == "I" || r._2 == "D").toSeq ==
      plain.filter(r => r._2 == "I" || r._2 == "D").toSeq)
    // U_post carries exactly what the post-only shape called U
    assert(pre.filter(_._2 == "U_post").map(r => (r._1, r._3, r._4)).toSeq ==
      plain.filter(_._2 == "U").map(r => (r._1, r._3, r._4)).toSeq)
    assert(pre.length == plain.length + 1) // one U key fanned into two rows
  }

  test("applyDelta equals recomputation across generations, and nets a span") {
    val dir = tmpDir("ivmdelta")
    MergeTable.write(spark, table(1000), "k", dir, nFiles = 8)
    val base = IncrementalView.compute(
      MergeTable.readTable(spark, dir, asOf = Some(0)), spec)

    MergeTable.merge(spark, dir, Seq(
      (10L, "U", "WEB", 999.0), (11L, "U", "WEB", 1.25),
      (20L, "D", null, 0.0), (21L, "D", null, 0.0),
      (5000L, "I", "NEW", 7.5)).toDF("k", "op", "seg", "bal"), "k")
    MergeTable.merge(spark, dir, Seq(
      (10L, "U", "WEB", 0.5),         // update an already-updated key
      (5000L, "D", null, 0.0),        // delete the gen-1 insert
      (20L, "I", "seg0", 30.0),       // re-insert a gen-1 delete
      (777L, "U", "seg1", 777.5)).toDF("k", "op", "seg", "bal"), "k")

    val s1 = IncrementalView.applyDelta(base,
      MergeTable.changesBetween(spark, dir, 0, 1, "k", preImages = true), spec)
    val s2 = IncrementalView.applyDelta(s1,
      MergeTable.changesBetween(spark, dir, 1, 2, "k", preImages = true), spec)
    val truth = IncrementalView.compute(MergeTable.readTable(spark, dir), spec)
    assert(rowsOf(s2) == rowsOf(truth))

    // one net span fold == two per-generation folds
    val spanned = IncrementalView.applyDelta(base,
      MergeTable.changesBetween(spark, dir, 0, 2, "k", preImages = true), spec)
    assert(rowsOf(spanned) == rowsOf(truth))
  }

  test("retraction semantics: emptied group leaves, all-null sum goes NULL; plain U fails loudly") {
    val dir = tmpDir("ivmnull")
    // gX: two rows (will be emptied); gN: one non-null + one null bal
    val t = Seq((1L, "gX", Some(5.0)), (2L, "gX", Some(6.0)),
      (3L, "gN", Some(5.0)), (4L, "gN", None), (5L, "gK", Some(1.0)))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, t, "k", dir, nFiles = 2)
    val base = IncrementalView.compute(
      MergeTable.readTable(spark, dir, asOf = Some(0)), spec)
    MergeTable.merge(spark, dir, Seq(
      (1L, "D", null, 0.0), (2L, "D", null, 0.0), (3L, "D", null, 0.0))
      .toDF("k", "op", "seg", "bal"), "k")
    val got = IncrementalView.applyDelta(base,
      MergeTable.changesBetween(spark, dir, 0, 1, "k", preImages = true), spec)
    // gX gone; gN keeps its null row but its sum is SQL-NULL now
    assert(rowsOf(got) == Seq(("gK", 1L, Some(1.0), 1L), ("gN", 1L, None, 0L)))
    assert(rowsOf(got) == rowsOf(
      IncrementalView.compute(MergeTable.readTable(spark, dir), spec)))

    // a post-only feed (plain U, no pre-image) must fail the job, not
    // silently drift the view
    val plainU = Seq((5L, "U", "gK", 2.0)).toDF("k", "change_op", "seg", "bal")
    val ex = intercept[Exception] {
      IncrementalView.applyDelta(base, plainU, spec).collect()
    }
    // pin the GUARD, not just "some exception": the raise_error branch
    // names the preImages contract — an incidental analysis error from
    // a different bug must not green this test
    assert(String.valueOf(ex.getMessage).contains("preImages"),
      s"expected the preImages-feed guard, got: ${ex.getMessage}")
  }

  test("persisted view: refresh folds the pending span, is idempotent, matches recompute") {
    val dir = tmpDir("ivmstore")
    val mv = tmpDir("ivmstore-mv")
    MergeTable.write(spark, table(500), "k", dir, nFiles = 4)
    assert(IncrementalView.materialize(spark, dir, "k", mv, spec) == 0)
    assert(IncrementalView.refresh(spark, dir, mv, spec).isEmpty) // current

    MergeTable.merge(spark, dir, Seq(
      (7L, "U", "WEB", 100.0), (8L, "D", null, 0.0), (900L, "I", "NEW", 2.5))
      .toDF("k", "op", "seg", "bal"), "k")
    MergeTable.merge(spark, dir, Seq(
      (7L, "U", "seg3", 50.0), (900L, "U", "NEW", 3.5))
      .toDF("k", "op", "seg", "bal"), "k")

    assert(IncrementalView.refresh(spark, dir, mv, spec).contains(2))
    val got = MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName)
    assert(rowsOf(got) ==
      rowsOf(IncrementalView.compute(MergeTable.readTable(spark, dir), spec)))
    assert(IncrementalView.reflectedGen(mv) == 2)
    assert(IncrementalView.refresh(spark, dir, mv, spec).isEmpty) // nothing pending
  }

  test("maintainStream keeps the persisted view current, exactly-once") {
    val dir = tmpDir("ivmstream")
    val mv = tmpDir("ivmstream-mv")
    val ckpt = tmpDir("ivmstream-ckpt")
    MergeTable.write(spark, table(300), "k", dir, nFiles = 4)
    IncrementalView.materialize(spark, dir, "k", mv, spec)
    val q = IncrementalView.maintainStream(spark, dir, mv, spec, ckpt)
    try {
      q.processAllAvailable() // nothing committed past gen 0 yet
      assert(IncrementalView.reflectedGen(mv) == 0)

      MergeTable.merge(spark, dir, Seq(
        (3L, "U", "WEB", 9.0), (4L, "D", null, 0.0), (600L, "I", "NEW", 1.0))
        .toDF("k", "op", "seg", "bal"), "k")
      q.processAllAvailable()
      assert(IncrementalView.reflectedGen(mv) == 1)
      assert(rowsOf(MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName)) ==
        rowsOf(IncrementalView.compute(MergeTable.readTable(spark, dir), spec)))

      MergeTable.merge(spark, dir, Seq((600L, "U", "NEW", 2.0))
        .toDF("k", "op", "seg", "bal"), "k")
      q.processAllAvailable()
      assert(IncrementalView.reflectedGen(mv) == 2)
      assert(rowsOf(MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName)) ==
        rowsOf(IncrementalView.compute(MergeTable.readTable(spark, dir), spec)))
    } finally q.stop()

    // exactly-once guard: re-folding an already-reflected span is a no-op
    val before = rowsOf(MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName))
    assert(IncrementalView.refresh(spark, dir, mv, spec).isEmpty)
    assert(rowsOf(MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName)) == before)
  }


  test("min/max views: affected groups recompute, retraction of the extremum re-reads (r20)") {
    val dir = tmpDir("ivmminmax")
    val mv = tmpDir("ivmminmax-mv")
    MergeTable.write(spark, table(400), "k", dir, nFiles = 4)
    val mmSpec = IncrementalView.ViewSpec(Seq("seg"),
      Seq("sb" -> "cast(bal as decimal(28,6))"),
      mins = Seq("lo" -> "bal"), maxs = Seq("hi" -> "bal"))
    def rowsMm(df: DataFrame): Seq[(String, Long, Option[Double], Option[Double])] =
      df.select(col("seg"), col("mv_count"), col("lo"), col("hi"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toSeq.sortBy(r => Option(r._1).getOrElse(""))
    IncrementalView.materialize(spark, dir, "k", mv, mmSpec)
    // the persisted spec round-trips mins/maxs through the commit meta
    assert(IncrementalView.specOf(mv) == mmSpec)
    // delete seg0's MAX (k=400, bal=600.0): the fold alone cannot know
    // the new max — refresh must re-read the group's source rows
    MergeTable.merge(spark, dir,
      Seq((400L, "D", null, 0.0)).toDF("k", "op", "seg", "bal"), "k")
    assert(IncrementalView.refresh(spark, dir, mv).contains(1))
    val got1 = rowsMm(MergeTable.readTable(spark, mv))
    assert(got1 == rowsMm(
      IncrementalView.compute(MergeTable.readTable(spark, dir), mmSpec)),
      "post-retraction view diverges from recompute")
    val seg0 = got1.find(_._1 == "seg0").get
    assert(seg0._4.contains(594.0), s"retracted max not re-read: $seg0")
    // UNAFFECTED groups carried their extremes (no recompute touched
    // them): seg1's max is k=397 → 595.5
    assert(got1.find(_._1 == "seg1").get._4.contains(595.5))
    // inserts extend extremes; updates retract-and-assert through the
    // same source recompute; all groups still equal recomputation
    MergeTable.merge(spark, dir, Seq(
      (900L, "I", "seg1", 9999.0), (3L, "U", "seg3", -1.0))
      .toDF("k", "op", "seg", "bal"), "k")
    assert(IncrementalView.refresh(spark, dir, mv).contains(2))
    val got2 = rowsMm(MergeTable.readTable(spark, mv))
    assert(got2 == rowsMm(
      IncrementalView.compute(MergeTable.readTable(spark, dir), mmSpec)))
    assert(got2.find(_._1 == "seg1").get._4.contains(9999.0))
    assert(got2.find(_._1 == "seg3").get._3.contains(-1.0))
    // idempotence: nothing pending, view unchanged
    assert(IncrementalView.refresh(spark, dir, mv).isEmpty)
    assert(rowsMm(MergeTable.readTable(spark, mv)) == got2)
    // the delta-only entry point refuses min/max specs loudly
    val e = intercept[IllegalArgumentException] {
      IncrementalView.applyDelta(
        MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName),
        MergeTable.changesBetween(spark, dir, 0, 1, "k", preImages = true),
        mmSpec)
    }
    assert(e.getMessage.contains("applyDeltaWithSource"))
    // a mismatched extremes spec is refused like a mismatched sum
    intercept[IllegalArgumentException] {
      IncrementalView.refresh(spark, dir, mv, mmSpec.copy(maxs = Nil))
    }
  }

  test("maintainStream routes min/max specs through the source-assisted fold (r20)") {
    val dir = tmpDir("ivmmmstream")
    val mv = tmpDir("ivmmmstream-mv")
    val ckpt = tmpDir("ivmmmstream-ckpt")
    MergeTable.write(spark, table(300), "k", dir, nFiles = 4)
    val mmSpec = IncrementalView.ViewSpec(Seq("seg"),
      Seq("sb" -> "cast(bal as decimal(28,6))"),
      maxs = Seq("hi" -> "bal"))
    def rowsMm(df: DataFrame): Seq[(String, Long, Option[Double])] =
      df.select(col("seg"), col("mv_count"), col("hi"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toSeq.sortBy(r => Option(r._1).getOrElse(""))
    IncrementalView.materialize(spark, dir, "k", mv, mmSpec)
    val q = IncrementalView.maintainStream(spark, dir, mv, mmSpec, ckpt)
    try {
      // delete seg0's max (k=300 → bal 450.0): the streamed fold must
      // re-read the group from the source, exactly like refresh
      MergeTable.merge(spark, dir,
        Seq((300L, "D", null, 0.0)).toDF("k", "op", "seg", "bal"), "k")
      q.processAllAvailable()
      assert(IncrementalView.reflectedGen(mv) == 1)
      val got = rowsMm(MergeTable.readTable(spark, mv))
      assert(got == rowsMm(
        IncrementalView.compute(MergeTable.readTable(spark, dir), mmSpec)),
        "streamed min/max view diverges from recompute")
      assert(got.find(_._1 == "seg0").get._3.contains(444.0),
        s"retracted max not re-read through the stream: $got")
    } finally q.stop()
  }

  test("property: maintained state tracks recomputation under random generation sequences") {
    val rnd = new scala.util.Random(42)
    val groups = Seq(Some("g0"), Some("g1"), Some("g2"), None)
    def rndBal(): Option[Double] =
      if (rnd.nextInt(5) == 0) None else Some((rnd.nextInt(2000) - 500) / 2.0)
    val dir = tmpDir("ivmprop")
    var live = (1L to 40L).map(k =>
      k -> (groups(rnd.nextInt(groups.size)), rndBal())).toMap
    MergeTable.write(spark,
      live.toSeq.map { case (k, (g, b)) => (k, g, b) }.toDF("k", "seg", "bal"),
      "k", dir, nFiles = 3)
    var state = IncrementalView.compute(
      MergeTable.readTable(spark, dir, asOf = Some(0)), spec).localCheckpoint()
    var nextKey = 100L
    (1 to 5).foreach { gen =>
      // random valid batch: deletes/updates on live keys, fresh inserts
      val dels = rnd.shuffle(live.keys.toSeq).take(rnd.nextInt(6))
      val upds = rnd.shuffle((live.keySet -- dels).toSeq).take(rnd.nextInt(8))
        .map(k => k -> (groups(rnd.nextInt(groups.size)), rndBal()))
      val inss = (0 until rnd.nextInt(6)).map { _ =>
        nextKey += 1
        nextKey -> (groups(rnd.nextInt(groups.size)), rndBal())
      }
      val batch =
        dels.map(k => (k, "D", None: Option[String], None: Option[Double])) ++
          upds.map { case (k, (g, b)) => (k, "U", g, b) } ++
          inss.map { case (k, (g, b)) => (k, "I", g, b) }
      MergeTable.merge(spark,
        dir, batch.toDF("k", "op", "seg", "bal"), "k")
      // merge semantics: U's null values KEEP the old value — mirror
      // that in the tracked model so the generated batches stay honest
      live = (live -- dels) ++ upds.map { case (k, (g, b)) =>
        val (og, ob) = live(k)
        k -> (g.orElse(og), b.orElse(ob))
      } ++ inss
      state = IncrementalView.applyDelta(state,
        MergeTable.changesBetween(spark, dir, gen - 1, gen, "k", preImages = true),
        spec).localCheckpoint()
      val truth = IncrementalView.compute(MergeTable.readTable(spark, dir), spec)
      assert(rowsOf(state) == rowsOf(truth), s"diverged at generation $gen")
    }
    // and the whole history nets in one fold
    val base = IncrementalView.compute(
      MergeTable.readTable(spark, dir, asOf = Some(0)), spec)
    val spanned = IncrementalView.applyDelta(base,
      MergeTable.changesBetween(spark, dir, 0, 5, "k", preImages = true), spec)
    assert(rowsOf(spanned) == rowsOf(state))
  }

  test("NULL group keys maintain correctly through the persisted path (null-safe joins)") {
    val dir = tmpDir("ivmnullgrp")
    val mv = tmpDir("ivmnullgrp-mv")
    val t = Seq((1L, Some("gA"), Some(1.0)), (2L, None, Some(2.0)),
      (3L, None, Some(3.0)), (4L, Some("gA"), Some(4.0)))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, t, "k", dir, nFiles = 2)
    IncrementalView.materialize(spark, dir, "k", mv, spec)
    // retract one NULL-group row, assert another: a null-unsafe state
    // join would lose the retraction AND duplicate the group's key
    MergeTable.merge(spark, dir, Seq(
      (2L, "D", None: Option[String], None: Option[Double]),
      (9L, "I", None: Option[String], Some(9.0)))
      .toDF("k", "op", "seg", "bal"), "k")
    assert(IncrementalView.refresh(spark, dir, mv, spec).contains(1))
    val got = MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName)
    assert(rowsOf(got) == rowsOf(
      IncrementalView.compute(MergeTable.readTable(spark, dir), spec)))
    assert(rowsOf(got).count(_._1 == null) == 1, "NULL group must stay ONE row")
    assert(rowsOf(got).find(_._1 == null).get == ((null, 2L, Some(12.0), 2L)))
  }

  test("a persisted view is a registered CDC consumer: vacuum can't silently break its refresh") {
    val dir = tmpDir("ivmhz")
    val mv = tmpDir("ivmhz-mv")
    MergeTable.write(spark, table(200), "k", dir, nFiles = 2)
    IncrementalView.materialize(spark, dir, "k", mv, spec)
    val id = IncrementalView.consumerId(mv)
    assert(MergeTable.cdcHorizons(dir) == Map(id -> 0))
    MergeTable.merge(spark, dir,
      Seq((1L, "D", null, 0.0)).toDF("k", "op", "seg", "bal"), "k")
    MergeTable.merge(spark, dir,
      Seq((2L, "D", null, 0.0)).toDF("k", "op", "seg", "bal"), "k")
    // the STALE view's next refresh needs its watermark manifest +
    // the span's superseded pre-image files — plain vacuum refuses,
    // naming the view's consumer id
    val ex = intercept[IllegalStateException] { MergeTable.vacuum(spark, dir) }
    assert(ex.getMessage.contains(id), ex.getMessage)
    // retention-aware vacuum reclaims around it and the refresh then
    // folds the span exactly, advancing the registered horizon
    MergeTable.vacuumRetaining(spark, dir)
    assert(IncrementalView.refresh(spark, dir, mv).contains(2))
    assert(MergeTable.cdcHorizons(dir) == Map(id -> 2))
    assert(rowsOf(MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName)) ==
      rowsOf(IncrementalView.compute(MergeTable.readTable(spark, dir), spec)))
    // caught up: plain vacuum passes; decommission releases the entry
    assert(MergeTable.vacuum(spark, dir) >= 0)
    // path spellings resolve to ONE registry entry
    assert(IncrementalView.consumerId(mv) ==
      IncrementalView.consumerId(mv + "/./"))
    assert(IncrementalView.consumerId(mv) ==
      IncrementalView.consumerId(mv + "/x/.."))
    // crash-catch-up: a refresh that died between its store commit and
    // its registration leaves the horizon stale — the next idempotent
    // refresh (nothing pending) re-advances it to the reflected
    // watermark instead of leaving vacuum blocked forever
    MergeTable.registerCdcHorizon(dir, id, 0) // simulate the stale entry
    assert(IncrementalView.refresh(spark, dir, mv).isEmpty)
    assert(MergeTable.cdcHorizons(dir)(id) == 2,
      s"idempotent refresh did not catch the horizon up: ${MergeTable.cdcHorizons(dir)}")
    assert(IncrementalView.release(dir, mv))
    assert(MergeTable.cdcHorizons(dir).isEmpty)
  }

  test("exactness regime: a floating-point sum is rejected with a decimal hint") {
    val t = Seq((1L, "g", 1.1)).toDF("k", "seg", "bal")
    val bad = IncrementalView.ViewSpec(Seq("seg"), Seq("sb" -> "bal"))
    val ex = intercept[IllegalArgumentException] {
      IncrementalView.compute(t, bad)
    }
    assert(ex.getMessage.contains("decimal") && ex.getMessage.contains("double"),
      ex.getMessage)
    // the delta path guards identically — a drifting feed can't sneak
    // a double sum past the materialize-time check
    val delta = Seq((1L, "I", "g", 1.1)).toDF("k", "change_op", "seg", "bal")
    intercept[IllegalArgumentException] {
      IncrementalView.applyDelta(IncrementalView.compute(t, spec), delta, bad)
    }
  }

  test("explicit refresh/maintain spec must match the persisted view definition") {
    val dir = tmpDir("ivmspecchk")
    val mv = tmpDir("ivmspecchk-mv")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 2)
    IncrementalView.materialize(spark, dir, "k", mv, spec)
    // same name + shape, different expression: folding its deltas onto
    // the persisted state would silently drift the view — must refuse
    val drifted = IncrementalView.ViewSpec(Seq("seg"),
      Seq("sb" -> "cast(bal * 2 as decimal(28,6))"))
    val ex = intercept[IllegalArgumentException] {
      IncrementalView.refresh(spark, dir, mv, drifted)
    }
    assert(ex.getMessage.contains("does not match"), ex.getMessage)
    intercept[IllegalArgumentException] {
      IncrementalView.maintainStream(spark, dir, mv, drifted, tmpDir("ivmspecchk-ck"))
    }
    // the matching spec (and the persisted-spec form) still refresh
    assert(IncrementalView.refresh(spark, dir, mv, spec).isEmpty) // current
    assert(IncrementalView.refresh(spark, dir, mv).isEmpty)
  }

  test("composition: corpus-stats view stays current through ingest + takedown on a governed store") {
    // the LLM-pipeline shape: documents live in a MergeTable; per-
    // (source, lang) corpus stats (docs, chars, token-ish count) are a
    // maintained view — new batches and right-to-erasure deletes reach
    // the dashboard via the CDC fold, never a corpus re-scan
    val dir = tmpDir("ivmcorpus")
    val mv = tmpDir("ivmcorpus-mv")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        (size(split(col("text"), "\\s+"))).cast("long").as("n_toks"))
    MergeTable.write(spark, docs, "doc_id", dir, nFiles = 4)
    val cSpec = IncrementalView.ViewSpec(Seq("source", "lang"),
      Seq("chars" -> "n_chars", "toks" -> "n_toks"))
    IncrementalView.materialize(spark, dir, "doc_id", mv, cSpec)

    // gen 1: an ingest batch (new doc_ids, one source); gen 2: a
    // takedown sweep (delete every doc of one lang in one source)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ingest = docs.limit(50)
      .select((col("doc_id") + maxId + 1).as("doc_id"), lit("I").as("op"),
        lit("crawlX").as("source"), col("lang"), col("n_chars"), col("n_toks"))
    MergeTable.merge(spark, dir, ingest, "doc_id")
    val victims = MergeTable.readTable(spark, dir)
      .filter(col("source") === "crawlX")
      .select(col("doc_id"), lit("D").as("op"), lit(null).cast("string").as("source"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("long").as("n_chars"), lit(null).cast("long").as("n_toks"))
    MergeTable.merge(spark, dir, victims, "doc_id")

    assert(IncrementalView.refresh(spark, dir, mv, cSpec).contains(2))
    val got = MergeTable.readTable(spark, mv).drop(IncrementalView.keyColName)
      .select("source", "lang", "mv_count", "chars", "toks")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sorted
    val want = IncrementalView.compute(MergeTable.readTable(spark, dir), cSpec)
      .select("source", "lang", "mv_count", "chars", "toks")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sorted
    assert(got == want)
    // the taken-down source is gone from the maintained stats entirely
    assert(!got.exists(_._1 == "crawlX"))
  }
}
