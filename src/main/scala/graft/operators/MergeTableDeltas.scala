package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Deletion vectors (segmented, batch-sized dvdelete commits) and the
  * CDC read side (changesBetween / pollChanges / changesStream) that
  * must see through them. Implementation partition of [[MergeTable]]
  * — see [[MergeTableLog]]'s header note.
  */
trait MergeTableDeltas { this: MergeTable.type =>
  // ---- deletion vectors (scattered-key DELETE without rewrites) ----
  //
  // [[deleteWhere]] is the BAND delete (metadata drops + boundary
  // rewrites); the shape it cannot serve at 100 TB is the SCATTERED
  // key delete — "remove these 1M user ids everywhere", the
  // GDPR/right-to-be-forgotten workload — where every key lands in a
  // different file and the banded path degenerates to rewriting most
  // of the table. Delta's answer is deletion vectors, and this is
  // that design at this layer: a commit records the (file, row
  // position) pairs to HIDE instead of rewriting the files, so the
  // write cost is ∝ deleted rows, the data files stay byte-identical
  // (carried across by reference as ever), and every read applies
  // the vector as an anti-join on `(_metadata.file_path,
  // _metadata.row_index)` — Spark's stable physical row identity for
  // immutable files, with data-column predicates still pushing down
  // through the join to the scan.
  //
  // Layout: the vector is SEGMENTED — `dv=<seg1>,<seg2>,…` in the
  // commit meta names one `dir/dv-g<N>~<token>/` dir per dvdelete
  // commit, each holding only ITS batch's (path, pos) rows, and
  // readers union the list (a pre-segment single-name meta parses as
  // one segment). Segments are why a long delete diet stays
  // batch-sized: r11 rewrote the CUMULATIVE relation every commit
  // (old ∪ hits → new dir), so the Nth dvdelete paid O(total hidden
  // rows); now it writes O(batch) and the union happens at read.
  // `dv_rows=<count>` is the total across segments (segments are
  // DISJOINT by construction — deleteKeys anti-joins its hits
  // against the current union, so a re-deleted key never re-enters).
  // Two events bound the segment count: [[dvSegmentCap]] makes the
  // capping dvdelete write one merged segment (amortized
  // O(total/cap) per commit — the same rollup discipline as
  // commit-log checkpoints), and any commit that rewrites or drops
  // files prunes their entries into one collapsed segment (the
  // rewrite read was vector-filtered, so the new bytes already
  // exclude the deleted rows — keeping stale entries would be wrong
  // the day row positions coincide). A commit that leaves the vector
  // untouched CARRIES the meta list verbatim (pointing at older
  // dirs, exactly how manifests reference older files-g dirs).
  // [[compact]]/[[recluster]] are therefore also the vector-
  // materialization passes: a full rewrite clears it. No `dv` meta
  // key = zero read-path overhead.
  //
  // Path forms: vector entries store `_metadata.file_path`'s form so
  // the producer and the probing anti-join are bit-identical;
  // manifest paths (input_file_name form) differ in slash count, so
  // every CROSS-form comparison normalizes driver-side via
  // [[normPath]] — never inside an expression.

  private[operators] def dvNameOf(gen: Int, token: String) = s"dv-g$gen~$token"

  /** Segment-count bound: the dvdelete that would make the list
    * LONGER than this writes one merged segment instead (see the
    * section comment) — read-side union cost and per-read existence
    * checks stay O(cap), write cost amortizes to O(total/cap).
    */
  private[graft] val dvSegmentCap = 8

  /** The segment dir names a generation's `dv` meta references
    * (empty = no vector). Pre-segment metas carry one name.
    */
  private[graft] def dvSegments(dir: String, gen: Int): Seq[String] =
    dvSegmentsOf(metaAt(dir, gen))
  private def dvSegmentsOf(meta: Map[String, String]): Seq[String] =
    meta.get("dv").toSeq.flatMap(_.split(',')).filter(_.nonEmpty)

  private[operators] def normPath(p: String): String =
    java.nio.file.Path.of(java.net.URI.create(p)).toAbsolutePath.toString

  /** The deletion-vector SEGMENT dir names + recorded total deleted-
    * row count at `gen` (None = no vector, reads are raw scans).
    * Returns the segments as a Seq — the r12 segmentation turned the
    * meta's `dv` value from one dir name into a comma-joined list, so
    * any caller still resolving a single path (`s"$dir/$name"`) must
    * break HERE at compile time, not build a bogus path at runtime.
    */
  def dvInfo(dir: String, gen: Int): Option[(Seq[String], Long)] = {
    val m = metaAt(dir, gen)
    // one grammar for the dv list: dvSegmentsOf (an inline re-parse
    // here could silently diverge from the read path's)
    m.get("dv").map(_ => (dvSegmentsOf(m),
      m.get("dv_rows").flatMap(_.toLongOption).getOrElse(-1L)))
  }

  private[operators] def dvFrameAt(s: SparkSession, dir: String, gen: Int): Option[DataFrame] = {
    // ONE log-entry read serves both the segment list and the
    // broadcast gate — this sits on the hot read path of every
    // vectored consumer
    val meta = metaAt(dir, gen)
    val segs = dvSegmentsOf(meta)
    if (segs.isEmpty) None
    else {
      val dirs = segs.map(n => s"$dir/$n")
      dirs.zip(segs).foreach { case (d, n) =>
        require(java.nio.file.Files.exists(java.nio.file.Path.of(d)),
          s"generation $gen unavailable: its deletion-vector segment $n was vacuumed")
      }
      val df = s.read.parquet(dirs: _*)
      // the committed dv_rows count is free plan knowledge the
      // optimizer doesn't have: a small vector (the common case)
      // broadcasts, keeping the anti-join off the shuffle path. The
      // cap is rows-based but sized like the byte thresholds Spark
      // uses: each entry carries a ~100-byte path string, so 100k
      // rows ≈ 10-20 MB hashed — a bigger vector (approaching
      // compaction territory) is left to the planner
      if (meta.get("dv_rows").flatMap(_.toLongOption)
          .exists(r => r > 0 && r <= 100000L)) Some(broadcast(df))
      else Some(df)
    }
  }

  /** Hide a vector's deleted rows from a scan that exposes
    * `_metadata`: anti-join on the stable physical row identity.
    * Callers split clean files off first (see [[readVisible]] /
    * [[readIndexed]]) so only vectored files pay this plan.
    */
  private[operators] def dvAntiJoin(df: DataFrame, dv: DataFrame): DataFrame =
    df.selectExpr("*", "_metadata.file_path AS __dv_fp",
        "_metadata.row_index AS __dv_ri")
      .join(dv.select(col("path").as("__dv_fp"), col("pos").as("__dv_ri")),
        Seq("__dv_fp", "__dv_ri"), "left_anti")
      .drop("__dv_fp", "__dv_ri")

  /** The visible rows of `paths` at `gen` — the vector-aware
    * multi-path read every consumer funnels through. The read SPLITS:
    * files with no vector entries scan RAW (full vectorized read +
    * whole-stage codegen, zero tax), only vectored files pay the
    * anti-join (which materializes a per-row `_metadata.file_path`
    * string) — so a table where a vector touches 1% of files pays the
    * tax on 1% of the scan, and a vector-free table takes the
    * pass-through branch entirely. The dirty-path split is one
    * file-count-bounded distinct over the vector relation,
    * driver-side like the manifest read that precedes every caller.
    */
  private[operators] def readVisible(s: SparkSession, dir: String, gen: Int,
                          paths: Seq[String]): DataFrame = {
    val raw = readerFor(s, dir, gen).parquet(paths: _*)
    dvFrameAt(s, dir, gen) match {
      case None => raw
      case Some(dv) =>
        val dirtyNorm = dv.select("path").distinct().collect()
          .map(r => normPath(r.getString(0))).toSet
        val (dirty, clean) = paths.partition(p => dirtyNorm.contains(normPath(p)))
        if (dirty.isEmpty) raw
        else {
          val d = dvAntiJoin(readerFor(s, dir, gen).parquet(dirty: _*), dv)
          if (clean.isEmpty) d
          else readerFor(s, dir, gen).parquet(clean: _*).unionByName(d)
        }
    }
  }

  /** The vector meta a file-rewriting commit carries forward: entries
    * for `removedPaths` (rewritten or dropped — their replacement
    * bytes were produced from vector-FILTERED reads) are pruned; an
    * untouched vector carries the OLD segment list without a write;
    * a fully-drained vector drops the meta key (table reads raw
    * again). A prune COLLAPSES the surviving entries into one
    * segment — rewrites are the rare, already-data-sized commits, so
    * they double as the segment-rollup points (the same reasoning
    * that makes compact the materialization pass). Driver cost: one
    * file-count-sized groupBy over the vector's paths.
    */
  private[operators] def dvMetaForCommit(s: SparkSession, dir: String, prevGen: Int,
                              nextGen: Int, token: String,
                              removedPaths: Seq[String]): Map[String, String] = {
    val prevMeta = metaAt(dir, prevGen)
    val segs = dvSegmentsOf(prevMeta)
    if (segs.isEmpty) Map.empty
    else {
      val oldDf = s.read.parquet(segs.map(n => s"$dir/$n"): _*)
      val removedNorm = removedPaths.map(normPath).toSet
      val perPath = oldDf.groupBy("path").count().collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val removeDvForm = perPath.map(_._1)
        .filter(p => removedNorm.contains(normPath(p))).toSet
      if (removeDvForm.isEmpty)
        Map("dv" -> segs.mkString(",")) ++ prevMeta.get("dv_rows").map("dv_rows" -> _)
      else {
        val remaining = perPath.filterNot(t => removeDvForm.contains(t._1))
        if (remaining.isEmpty) Map.empty
        else {
          oldDf.filter(!col("path").isin(removeDvForm.toSeq: _*))
            .coalesce(4).write.parquet(s"$dir/${dvNameOf(nextGen, token)}")
          Map("dv" -> dvNameOf(nextGen, token),
            "dv_rows" -> remaining.map(_._2).sum.toString)
        }
      }
    }
  }

  /** `dv`/`dv_rows` carried verbatim — for metadata-only commits
    * (dropColumn, carry-forward, restore-to-generation) that change
    * no file's visibility.
    */
  private[operators] def inheritDvMeta(dir: String, fromGen: Int): Map[String, String] = {
    val m = metaAt(dir, fromGen)
    m.get("dv").map("dv" -> _).toMap ++ m.get("dv_rows").map("dv_rows" -> _).toMap
  }

  /** DELETE scattered keys via a deletion-vector commit: stats-prune
    * the candidate files (each key hits its range's files — on a
    * key-ordered layout, |keys| files, not the table), scan ONLY
    * their key column to locate row positions, and commit the hits
    * as a NEW vector SEGMENT with the manifest carried VERBATIM —
    * zero data bytes rewritten, cost ∝ candidates' key column +
    * batch (the existing vector is only re-read, never rewritten,
    * until the [[dvSegmentCap]]'th commit rolls the segments up).
    * The band shapes stay on [[deleteWhere]]; this is the
    * 1M-scattered-keys shape where banding degenerates to a
    * near-full rewrite. Rows already hidden by the current vector
    * never re-enter it, so segments stay disjoint and `dv_rows`
    * additive. Returns MergeStats(gen, files that gained vector
    * entries, rest); a batch hitting nothing commits nothing.
    *
    * `keyCol` may be ANY column, not just the table's merge key
    * (r20): row identity here is positional (`_metadata`), so the
    * locate column only drives candidate pruning and hit matching —
    * "delete every row whose doc_id is doomed" on a table KEYED by
    * something else is exactly the LSH bands takedown (the doomed ids
    * scatter under the hashed key, so a rewrite would touch every
    * file while this commits O(batch) vector rows). An UNSTATTED
    * locate column admits every file as candidate — still one narrow
    * column scan, never a rewrite. Duplicate matches are fine (a
    * non-unique locate column hides every matching position).
    */
  def deleteKeys(s: SparkSession, dir: String, keyCol: String,
                 keys: DataFrame): MergeStats = {
    val prevGen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    // the row-position scan resolves `_metadata.file_path/row_index`;
    // a table with a REAL column of that name would shadow Spark's
    // metadata struct and silently misidentify positions — refuse
    // loudly, like the reserved `__dv_*` aliases below
    schemaAt(dir, prevGen).foreach(sch => require(
      !sch.fieldNames.exists(_.equalsIgnoreCase("_metadata")),
      s"$dir has a real column named '_metadata', which shadows Spark's " +
        "file-metadata struct — deleteKeys cannot locate row positions; " +
        "rename the column or use merge/deleteWhere"))
    val next = prevGen + 1
    val token = newToken()
    // one driver-side manifest read serves the path list, the
    // range probe and (by byte copy) the verbatim manifest carry (r21)
    val (manSchema, manRows) = manifestRowsAt(s, dir, prevGen)
    val man = s.createDataFrame(manRows.asJava, manSchema)
    val allPaths = manRows.map(_.getString(manSchema.fieldIndex("path")))
    // resolve the key column BY NAME when the frame carries it (a
    // multi-column frame with the key second must not silently hide
    // rows keyed by some other column's values); a frame without the
    // name must be single-column to be unambiguous
    val keyDf = keys.columns.find(_.equalsIgnoreCase(keyCol)) match {
      case Some(c) => keys.select(col(c).as(keyCol)).distinct()
      case None =>
        require(keys.columns.length == 1,
          s"keys frame must carry a '$keyCol' column or be single-column, " +
            s"got (${keys.columns.mkString(", ")})")
        keys.select(col(keys.columns.head).as(keyCol)).distinct()
    }
    // manifest path rides under a reserved alias: the TABLE's key may
    // itself be named 'path', and a bare select("path") after the
    // range join would be ambiguous; an unstatted locate column
    // yields all-null bounds → every file admits (null-admits, like
    // every stats consumer)
    val ranges =
      if (man.columns.contains(s"min_$keyCol"))
        man.select(col("path").as("__mf_path"),
          col(s"min_$keyCol").as("__mn"), col(s"max_$keyCol").as("__mx"))
      else man.select(col("path").as("__mf_path"),
        lit(null).as("__mn"), lit(null).as("__mx"))
    // null-admits like every stats consumer (merge's touched logic)
    val cands = keyDf.join(broadcast(ranges),
        (col("__mn").isNull || col(keyCol) >= col("__mn")) &&
          (col("__mx").isNull || col(keyCol) <= col("__mx")))
      .select("__mf_path").distinct().collect().map(_.getString(0)).toIndexedSeq
    if (cands.isEmpty) return MergeStats(prevGen, Nil, allPaths)
    // reserved __dv_* aliases until the final projection: a table
    // legitimately keyed by a column NAMED 'path' or 'pos' must not
    // collide with the position columns mid-plan
    val scan = readerFor(s, dir, prevGen).parquet(cands: _*)
      .select(col(keyCol), col("_metadata.file_path").as("__dv_fp"),
        col("_metadata.row_index").as("__dv_ri"))
    val oldDv = dvFrameAt(s, dir, prevGen)
    val visible = oldDv.fold(scan)(dv =>
      scan.join(dv.select(col("path").as("__dv_fp"), col("pos").as("__dv_ri")),
        Seq("__dv_fp", "__dv_ri"), "left_anti"))
    // localCheckpoint: the hit set is read twice (count + vector
    // write) and must not re-scan the candidates' key column twice
    val hits = visible.join(keyDf, Seq(keyCol), "left_semi")
      .select(col("__dv_fp").as("path"), col("__dv_ri").as("pos"))
      .localCheckpoint()
    val fresh = hits.count()
    if (fresh == 0L) return MergeStats(prevGen, Nil, allPaths)
    // segment discipline: write ONLY this batch's hits — O(batch) per
    // commit — unless this commit would push the list past the cap,
    // in which case write the merged union as one rolled-up segment
    // (amortized O(total/cap); the read union stays O(cap) dirs)
    val prevSegs = dvSegments(dir, prevGen)
    val segName = dvNameOf(next, token)
    val newSegs: Seq[String] =
      if (prevSegs.size + 1 > dvSegmentCap) {
        oldDv.fold(hits)(_.unionByName(hits))
          .coalesce(4).write.parquet(s"$dir/$segName")
        Seq(segName)
      } else {
        hits.coalesce(4).write.parquet(s"$dir/$segName")
        prevSegs :+ segName
      }
    copyManifestGen(dir, prevGen, next, token)
    // total hidden rows: additive over disjoint segments — but an
    // UNKNOWN prior count (a pre-segment-era meta with no dv_rows, or
    // a recorded -1) must stay unknown, not read as 0: a confidently
    // wrong small total would mislead dvInfo/CLI AND trip dvFrameAt's
    // broadcast gate into hashing an arbitrarily large vector
    val prevRowsOpt = metaAt(dir, prevGen).get("dv_rows")
      .flatMap(_.toLongOption)
    // a recorded negative is unknown REGARDLESS of the segment list —
    // dv_rows=-1 with an empty dv list must not re-enter arithmetic
    // as Some(-1) and yield a confidently wrong fresh-1
    val totalRows =
      if (prevRowsOpt.exists(_ < 0) ||
          (prevSegs.nonEmpty && prevRowsOpt.isEmpty)) -1L
      else prevRowsOpt.getOrElse(0L) + fresh
    try commitGen(dir, next, token, Map("op" -> "dvdelete",
      "dv" -> newSegs.mkString(","),
      "dv_rows" -> totalRows.toString,
      "deleted" -> fresh.toString) ++
      schemaAt(dir, prevGen).map(sch => Map("schema" -> sch.json)).getOrElse(Map.empty))
    catch {
      case e: java.util.ConcurrentModificationException =>
        Seq(s"$dir/${dvNameOf(next, token)}", manifestDirOf(dir, next, token))
          .foreach(graft.IndexLifecycle.deleteRecursively)
        throw e
    }
    val dvPaths = hits.select("path").distinct().collect()
      .map(r => normPath(r.getString(0))).toSet
    // one partition pass on the set — Seq.contains per path would be
    // quadratic at exactly the scattered-GDPR manifest size this op
    // exists for
    val (touched, untouched) =
      allPaths.partition(p => dvPaths.contains(normPath(p)))
    MergeStats(next, touched, untouched)
  }

  /** Convenience overload: keys as literals, typed by the table's
    * key column.
    */
  def deleteKeys(s: SparkSession, dir: String, keyCol: String,
                 keys: Seq[Any]): MergeStats = {
    val gen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val kt = schemaAt(dir, gen)
      .flatMap(_.fields.find(_.name.equalsIgnoreCase(keyCol))).map(_.dataType)
      .getOrElse(sys.error(s"$dir records no schema; pass keys as a DataFrame"))
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField(keyCol, kt)))
    val rows = keys.map(k => org.apache.spark.sql.Row(k))
    deleteKeys(s, dir, keyCol,
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), schema))
  }

  def changesStream(s: SparkSession, dir: String, keyCol: String,
                    startGen: Int = 0, preImages: Boolean = false): DataFrame =
    s.readStream.format(classOf[graft.sources.CdcSourceProvider].getName)
      .option("path", dir).option("keyCol", keyCol)
      .option("startGen", startGen.toString)
      .option("preImages", preImages.toString).load()

  def pollChanges(s: SparkSession, dir: String, lastSeenGen: Int,
                  keyCol: String, preImages: Boolean = false): Option[(Int, DataFrame)] = {
    val cur = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    if (cur <= lastSeenGen) None
    else Some((cur, changesBetween(s, dir, lastSeenGen, cur, keyCol, preImages)))
  }

  /** Observability of one merge's pruning decision. */
  final case class MergeStats(gen: Int, touched: Seq[String], untouched: Seq[String])

  /** CDC read between two committed generations, the manifest-pruned
    * way: files referenced by BOTH manifests were carried by
    * reference — byte-identical by construction — so the diff opens
    * ONLY the files that differ between the two generations. At
    * 100 TB that is the difference between "read the rewritten band
    * twice" and "read the table twice": a day's merge against a
    * year's dimension diffs in time ∝ the day.
    *
    * Returns one row per net-changed key across the span with
    * `change_op` `I`/`U`/`D` and the table's value columns — post-
    * image for I/U, pre-image for D. Rows that round-trip unchanged
    * inside a rewritten file (residents of a touched file that no
    * change hit) are dropped by a null-safe per-column comparison,
    * and a key inserted then deleted within the span nets out to no
    * row, so the result is the LOGICAL delta, not the physical one.
    *
    * `preImages = true` switches to Delta's CDF shape for updates:
    * each U key emits TWO rows, `U_pre` (old values) and `U_post`
    * (new values), which is what a delta-maintained consumer (an
    * incremental aggregate view, a downstream index) needs to
    * retract-then-assert — `retract sum(x) by pre, add by post` is
    * exact where a post-only feed would have to re-read the base.
    * Produced by one conditional-array explode over the SAME single
    * diff join (no second pass, stays in codegen).
    */
  def changesBetween(s: SparkSession, dir: String, fromGen: Int, toGen: Int,
                     keyCol: String, preImages: Boolean = false): DataFrame = {
    require(fromGen < toGen, s"need fromGen < toGen, got $fromGen >= $toGen")
    // memoized manifest-path resolution (livePathsAt): the reads that
    // precede a CDC call in the same session already collected these
    // lists; a memo hit skips both manifest parquet jobs (r21)
    val pathsA = livePathsAt(s, dir, fromGen).toSet
    val pathsB = livePathsAt(s, dir, toGen).toSet
    // deletion vectors: a file in BOTH manifests still changes VISIBLY
    // when the span changed its vector ENTRIES (a dvdelete hid rows
    // without touching bytes — and a restore can swap a vector for an
    // older one with the same entry COUNT but different positions, so
    // the comparison must be the exact symmetric difference, not a
    // per-path count). One vector-sized full-outer join decides the
    // changed-path set; such files diff on BOTH sides, each side
    // vector-filtered as of its generation: untouched residents
    // cancel in the join and the span's hidden/resurrected rows
    // surface as D/I, with no DML-side bookkeeping.
    val dvChanged: IndexedSeq[String] = if (
      // identical segment LISTS prove identical vectors (segment dirs
      // are immutable and gen~token-named) — the common CDC span on a
      // table with a standing vector takes this meta-only exit
      // instead of full-outer-joining the vector against itself
      dvSegments(dir, fromGen) == dvSegments(dir, toGen)
    ) IndexedSeq.empty else {
      val a = dvFrameAt(s, dir, fromGen).map(_.select("path", "pos"))
      val b = dvFrameAt(s, dir, toGen).map(_.select("path", "pos"))
      val changedNorm: Set[String] = (a, b) match {
        case (None, None) => Set.empty
        case (one, other) =>
          val af = one.getOrElse(other.get.limit(0))
          val bf = other.getOrElse(one.get.limit(0))
          af.withColumn("__a", lit(true))
            .join(bf.withColumn("__b", lit(true)), Seq("path", "pos"), "full_outer")
            .filter(col("__a").isNull || col("__b").isNull)
            .select("path").distinct().collect()
            .map(r => normPath(r.getString(0))).toSet
      }
      (pathsA intersect pathsB)
        .filter(p => changedNorm.contains(normPath(p))).toIndexedSeq
    }
    val onlyA = (pathsA -- pathsB).toIndexedSeq ++ dvChanged
    val onlyB = (pathsB -- pathsA).toIndexedSeq ++ dvChanged
    val anyPathOpt = (onlyA ++ onlyB ++ pathsA ++ pathsB).headOption
    if (anyPathOpt.isEmpty) {
      // BOTH endpoints fully deleted (metadata-only commits between
      // empty generations — a dropColumn or carry-forward after a
      // delete-everything): the net delta is EMPTY, and a tailing
      // consumer must receive it typed from the log schema, not crash
      // into a permanent poll loop
      val sch = schemaAt(dir, toGen).orElse(schemaAt(dir, fromGen)).getOrElse(
        sys.error(s"$dir has no data files in either generation and no " +
          "log schema to type an empty delta"))
      val keyField = sch.fields.find(_.name.equalsIgnoreCase(keyCol)).getOrElse(
        sys.error(s"log schema of $dir lacks key column '$keyCol'"))
      val out = org.apache.spark.sql.types.StructType(
        keyField +: org.apache.spark.sql.types.StructField("change_op",
          org.apache.spark.sql.types.StringType, nullable = false) +:
          sch.fields.filterNot(_.name.equalsIgnoreCase(keyCol)))
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], out)
    }
    val anyPath = anyPathOpt.get
    def side(paths: IndexedSeq[String], gen: Int) =
      if (paths.nonEmpty) readVisible(s, dir, gen, paths)
      else readerFor(s, dir, gen).parquet(anyPath).limit(0)
    val (o0, n0) = (side(onlyA, fromGen), side(onlyB, toGen))
    // value columns = union of both sides (the span may cross a schema
    // evolution); a side lacking a column contributes nulls, so a
    // pre-evolution row gaining a non-null value surfaces as U
    // value columns: union of both sides, RESTRICTED to the toGen log
    // schema when one exists — a span crossing a dropColumn must not
    // resurrect the dropped column as a spurious per-resident U (the
    // old side carries it, the new side aligns null, differs fires for
    // every untouched row of a rewritten file); the feed's view is the
    // END generation's schema, same posture as the streaming source
    val logCols = schemaAt(dir, toGen).map(_.fieldNames.toSet)
    // key excluded case-INSENSITIVELY like every other key resolution
    // in this API (a caller's 'K' against a table's 'k' must not leak
    // the key into vcols and emit a duplicate output column)
    val vcols = (o0.columns ++ n0.columns).distinct
      .filterNot(_.equalsIgnoreCase(keyCol))
      .filter(c => logCols.forall(_.contains(c))).toSeq
    // align missing columns to the OTHER side's type, not NullType —
    // a typed null keeps the pre/post structs union-compatible below
    val vtypes = (o0.schema.fields ++ n0.schema.fields)
      .map(f => f.name -> f.dataType).toMap
    def aligned(df: DataFrame) =
      vcols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(vtypes(c))))
    val o = aligned(o0).select(col(keyCol) +: lit(true).as("__in_o") +:
      vcols.map(c => col(c).as(s"__o_$c")): _*)
    val n = aligned(n0).select(col(keyCol) +: lit(true).as("__in_n") +:
      vcols.map(c => col(c).as(s"__n_$c")): _*)
    val differs = vcols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    // plain (non-null-safe) key equality is sound here because null
    // keys are unreachable: the gen-0 write guard and merge's batch
    // gate refuse them (a null-key resident of a rewritten file would
    // otherwise never match itself and surface as a spurious D+I)
    val joined = o.join(n, Seq(keyCol), "full_outer")
      .withColumn("change_op",
        when(col("__in_n").isNull, lit("D"))
          .when(col("__in_o").isNull, lit("I"))
          .otherwise(lit("U")))
      .filter(col("change_op") =!= "U" || differs)
    if (!preImages)
      joined.select(col(keyCol) +: col("change_op") +:
        vcols.map(c => when(col("change_op") === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)): _*)
    else if (vcols.isEmpty)
      // a key-only table can't produce U (differs is const-false)
      joined.select(col(keyCol), col("change_op"))
    else {
      val pre = struct(vcols.map(c => col(s"__o_$c").as(c)): _*)
      val post = struct(vcols.map(c => col(s"__n_$c").as(c)): _*)
      val fanned = when(col("change_op") === "U",
          array(struct(lit("U_pre").as("op"), pre.as("v")),
            struct(lit("U_post").as("op"), post.as("v"))))
        .when(col("change_op") === "D",
          array(struct(lit("D").as("op"), pre.as("v"))))
        .otherwise(array(struct(lit("I").as("op"), post.as("v"))))
      joined.select(col(keyCol), explode(fanned).as("__x"))
        .select(col(keyCol), col("__x.op").as("change_op"), col("__x.v.*"))
    }
  }

}
