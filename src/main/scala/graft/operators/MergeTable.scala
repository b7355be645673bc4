package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** q59: file-pruned MERGE — q56's MERGE semantics applied to a
  * PHYSICAL multi-file table through a min/max-stats manifest, so a
  * change batch rewrites ONLY the files whose key range it
  * intersects and carries every other file across BY REFERENCE.
  * SURVEY.md's q56 row names exactly this as the 100 TB shape: the
  * join/rewrite plan stays q56's, and the table format around it
  * (stats manifest + generation marker) adds the file-level pruning
  * a Delta/Iceberg layer would provide.
  *
  * Layout of a keyed table at `dir`:
  * {{{
  *   dir/files-g<N>~<token>/part-*.parquet  data files, range-written on the key
  *   dir/manifest-g<N>~<token>/             (path, n_rows, min_<c>/max_<c> per statted col) per LIVE file
  *   dir/_log/_commit-g<N>                  commit-log entry: token=<token> + metadata
  *   dir/_log/_checkpoint-g<N>, _last_checkpoint   log rollups + pointer (see the checkpointing section)
  * }}}
  * Commits form an append-only log with OPTIMISTIC CONCURRENCY: each
  * writer stages into dirs suffixed by its own token (racing writers
  * never collide on paths), then publishes generation N by
  * hard-linking a fully-written tmp file to `_commit-g<N>` —
  * `link(2)` never replaces an existing name, so of two writers
  * racing the same generation exactly ONE wins and the loser gets a
  * `ConcurrentModificationException` to retry on the new base (a
  * lost update is impossible: the loser's work was computed from a
  * manifest that is no longer current). Readers resolve max
  * committed N → its token → manifest → file paths, so a crash
  * anywhere before the link leaves only invisible staging that the
  * next vacuum sweeps. A manifest may reference files from EARLIER
  * generations (that is the pruning: untouched files are never
  * copied).
  *
  * At 100 TB: the manifest is file-count-sized (KBs per thousand
  * files), the pruning join broadcasts it against the change batch,
  * and the rewrite reads/writes only the intersecting files — a
  * change batch touching one day of a date-keyed dimension rewrites
  * that day, not the table. Everything else (the overlay join shape,
  * the oracle) is q56.
  */
object MergeTable {
  type Q = (SparkSession, String) => DataFrame

  private def r2(c: Column) = round(c * 100) / 100

  // ---- commit log ----
  //
  // Log entries live in a `_log/` SUBDIR (Delta's `_delta_log`
  // layout), not the table root — deliberately. The root's listing
  // cost is what every auxiliary resolution pays (bloom sidecar
  // discovery, CDC horizon registry, governance version reads, the
  // vacuum sweep), and commit markers are the one UNBOUNDED
  // population: a streaming upsert sink mints one per micro-batch,
  // so markers in the root would turn every bloom point-probe and
  // every merge's governance read into an O(commits) listing at
  // 10^5–10^6 generations. With markers (and checkpoint rollups)
  // under `_log/`, the root holds only vacuum-bounded data/manifest
  // dirs and small aux files — listings stay flat forever, and the
  // log itself is never listed on the hot path (committedGen probes
  // the dense tail by name; history/metaAt read by generation
  // number). Pre-`_log` tables keep working: reads fall back to
  // root-level markers, and the listing fallback merges both
  // locations. Mixed-version WRITERS are not supported (an old
  // binary's root link and a new binary's _log link could both win
  // one generation) — upgrade quiesced, the standard table-format
  // protocol-bump discipline.

  private def logDirOf(dir: String) = java.nio.file.Path.of(dir, "_log")

  /** The control-plane store for a table (see [[CommitStore]]): POSIX
    * by default, spec-pinned alternatives by registered prefix. Every
    * marker/checkpoint/governance/horizon byte flows through it; data
    * and manifest parquet stay on the filesystem Spark writes to.
    */
  private def store(dir: String): CommitStore = CommitStore.forDir(dir)

  /** Canonical (v2) marker path — the link target for new commits. */
  private def markerOf(dir: String, gen: Int) =
    logDirOf(dir).resolve(s"_commit-g$gen")

  private def legacyMarkerOf(dir: String, gen: Int) =
    java.nio.file.Path.of(dir, s"_commit-g$gen")

  /** Where to READ a generation's marker: the `_log/` path when
    * present, the pre-`_log` root path otherwise.
    */
  private def markerReadPath(dir: String, gen: Int): java.nio.file.Path = {
    val v2 = markerOf(dir, gen)
    if (store(dir).exists(v2)) v2 else legacyMarkerOf(dir, gen)
  }

  private def markerExists(dir: String, gen: Int): Boolean =
    store(dir).exists(markerOf(dir, gen)) ||
      store(dir).exists(legacyMarkerOf(dir, gen))

  /** The newest committed generation. Fast path: the `_last_checkpoint`
    * pointer names a rolled-up generation, and generations are DENSE
    * (every commit is prev+1), so probing `_commit-g<N+1>, <N+2>, …`
    * until the first miss resolves the head in O(tail) stat calls —
    * flat in total commit count, where the listing fallback (no or
    * corrupt checkpoint) pays O(commits) directory entries. A STALE
    * pointer (crashed checkpoint writer, lost pointer race) only
    * lengthens the probe, never changes the answer.
    */
  def committedGen(dir: String): Option[Int] = {
    val p = java.nio.file.Path.of(dir)
    if (!java.nio.file.Files.exists(p)) None
    else lastCheckpointGen(dir) match {
      case Some(ck) =>
        var g = ck
        while (markerExists(dir, g + 1)) g += 1
        Some(g)
      case None =>
        def gensIn(d: java.nio.file.Path): Seq[Int] =
          store(dir).list(d)
            .filter(_.matches("_commit-g\\d+"))
            .map(_.stripPrefix("_commit-g").toInt)
        // both locations: a pre-_log table upgraded mid-life carries
        // its early generations in the root and the rest in _log/
        val gens = gensIn(logDirOf(dir)) ++ gensIn(p)
        if (gens.isEmpty) None else Some(gens.max)
    }
  }

  /** One commit-log entry's `k=v` lines (always includes `token`;
    * the streaming upsert sink's batch watermark rides here too, so
    * generation and watermark commit in the SAME atomic link).
    */
  /** The `k=v`-lines file format shared by commit-log entries and
    * checkpoint rollups — one parser, so the two can't drift.
    */
  private def readKvFile(st: CommitStore, p: java.nio.file.Path): Map[String, String] =
    st.read(p) match {
      case None => Map.empty
      case Some(bytes) =>
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator.filter(_.contains('='))
          .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
    }

  def metaAt(dir: String, gen: Int): Map[String, String] =
    readKvFile(store(dir), markerReadPath(dir, gen))

  def committedMeta(dir: String): Map[String, String] =
    committedGen(dir).map(metaAt(dir, _)).getOrElse(Map.empty)

  // ---- commit-log checkpointing ----
  //
  // Every metadata resolution above is a directory listing plus tiny
  // per-generation reads — correct, but O(commits), and a streaming
  // upsert sink mints a commit per micro-batch: at 10^5–10^6
  // generations the driver would pay seconds per committedGen /
  // reflectedGen where Delta pays one checkpoint read. Delta's exact
  // fix at this layer: every [[checkpointInterval]] commits, the
  // committing writer rolls the log up into `_checkpoint-g<N>`
  // (generation, its commit meta, the newest view-watermark meta at
  // or below it, a CDC-horizon snapshot) and points
  // `_last_checkpoint` at it; readers resolve from the pointer plus
  // the SHORT tail of newer `_commit-g*` markers, never the whole
  // log. The rollup itself is O(interval): the writer folds the tail
  // since the PREVIOUS checkpoint into that checkpoint's rollup.
  //
  // Failure isolation: checkpoints are best-effort observers of a
  // commit that has already linked — a checkpoint/pointer write
  // failure logs loudly and costs resolution speed only (committedGen
  // falls back to the listing; the view-watermark walk goes deeper).
  // The pointer is advanced forward-only (a delayed writer of an
  // OLDER checkpoint skips rather than regresses; the remaining
  // read-then-move window can at worst re-point at the older rollup,
  // which lengthens the tail probe, never changes an answer). The
  // `_commit-g*` log stays the single source of truth, still survives
  // vacuum, and [[history]] still reads it entry by entry.

  private[graft] val checkpointInterval = 16

  private def checkpointFileOf(dir: String, gen: Int) =
    logDirOf(dir).resolve(s"_checkpoint-g$gen")
  private def lastCheckpointPtr(dir: String) =
    logDirOf(dir).resolve("_last_checkpoint")

  /** The generation the `_last_checkpoint` pointer names, validated
    * against both the checkpoint file and the commit log (a corrupt
    * or dangling pointer yields None → readers use the listing path).
    */
  private[graft] def lastCheckpointGen(dir: String): Option[Int] =
    store(dir).read(lastCheckpointPtr(dir))
      .flatMap(b => scala.util.Try(new String(b,
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt).toOption)
      .filter(g => g >= 0 &&
        store(dir).exists(checkpointFileOf(dir, g)) &&
        markerExists(dir, g))

  /** One checkpoint's `k=v` lines: `gen`, `meta.<k>` (the generation's
    * own commit meta), optional `mv.<k>` (newest view-watermark meta
    * at or below the checkpoint) and `horizon.<consumer>` snapshot.
    * Resolution consumes only existence + `mv.*`; the `meta.*` copy
    * and the horizon snapshot are the rollup's OBSERVABILITY surface
    * — `cat` one file to see where the table stood at the rollup
    * instead of stitching log entries and horizon files by hand.
    */
  private[graft] def checkpointAt(dir: String, gen: Int): Map[String, String] =
    readKvFile(store(dir), checkpointFileOf(dir, gen))

  /** The view-watermark rollup a checkpoint carries: the newest commit
    * meta at or below it containing `mv_src_gen` (None when the table
    * had no view watermark anywhere in gens 0..checkpoint).
    */
  private[graft] def checkpointMvMeta(dir: String, gen: Int): Option[Map[String, String]] = {
    val mv = checkpointAt(dir, gen).collect {
      case (k, v) if k.startsWith("mv.") => k.stripPrefix("mv.") -> v }
    if (mv.isEmpty) None else Some(mv)
  }

  /** Roll the log up at `gen` (a multiple of [[checkpointInterval]])
    * and advance the pointer. Called by the winner of `gen` AFTER the
    * commit link landed; any failure is the caller's to log — the
    * commit itself is durable either way.
    */
  private def writeCheckpoint(dir: String, gen: Int): Unit = {
    // previous checkpoint: descending multiples of the interval (a
    // failed writer may have skipped one — probe further back)
    val prevCkpt = Iterator.from(1).map(i => gen - i * checkpointInterval)
      .takeWhile(_ > 0)
      .find(g => store(dir).exists(checkpointFileOf(dir, g)))
    val mvMeta: Option[Map[String, String]] =
      (gen to (prevCkpt.getOrElse(0) + 1) by -1).iterator
        .map(g => metaAt(dir, g))
        .collectFirst { case m if m.contains("mv_src_gen") => m }
        .orElse(prevCkpt.flatMap(g => checkpointMvMeta(dir, g)))
        .orElse( // no prev checkpoint: gen 0 is the only gen left
          if (prevCkpt.isEmpty && metaAt(dir, 0).contains("mv_src_gen"))
            Some(metaAt(dir, 0)) else None)
    val body = (Seq("gen" -> gen.toString) ++
      metaAt(dir, gen).toSeq.sorted.map { case (k, v) => s"meta.$k" -> v } ++
      mvMeta.toSeq.flatMap(_.toSeq.sorted.map { case (k, v) => s"mv.$k" -> v }) ++
      cdcHorizons(dir).toSeq.sorted.map { case (c, g) => s"horizon.$c" -> g.toString })
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    store(dir).putReplace(checkpointFileOf(dir, gen), body.getBytes("UTF-8"))
    // forward-only pointer advance (see the section comment)
    if (!lastCheckpointGen(dir).exists(_ >= gen))
      store(dir).putReplace(lastCheckpointPtr(dir), s"$gen\n".getBytes("UTF-8"))
  }

  /** The table schema recorded in a generation's commit-log entry
    * (Delta keeps schema in the log for the same reason): readers get
    * the authoritative union schema WITHOUT a footer-merge job, and
    * an explicit read schema makes pre-evolution files surface
    * missing columns as null exactly like mergeSchema would.
    */
  def schemaAt(dir: String, gen: Int): Option[org.apache.spark.sql.types.StructType] =
    metaAt(dir, gen).get("schema").map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Parquet reader for a generation: log-recorded schema when
    * present (no footer pass), mergeSchema fallback otherwise.
    */
  private def readerFor(s: SparkSession, dir: String, gen: Int) =
    schemaAt(dir, gen).map(s.read.schema)
      .getOrElse(s.read.option("mergeSchema", "true"))

  /** Per-writer staging discriminator: pid + nanotime. Two writers
    * (threads OR processes) never share staging paths.
    */
  private def newToken(): String =
    ProcessHandle.current().pid().toString + "-" +
      java.lang.Long.toHexString(System.nanoTime())

  private def dataDirOf(dir: String, gen: Int, token: String) =
    s"$dir/files-g$gen~$token"
  private def manifestDirOf(dir: String, gen: Int, token: String) =
    s"$dir/manifest-g$gen~$token"

  /** Publish generation `gen` via the store's put-if-absent — a true
    * compare-and-swap on the generation number (`link(2)` on the
    * POSIX store, a conditional put on an object store; neither ever
    * replaces an existing name) — so the loser of a race gets
    * [[java.util.ConcurrentModificationException]] and must retry
    * its whole merge on the new base.
    */
  private def commitGen(dir: String, gen: Int, token: String,
                        meta: Map[String, String]): Unit = {
    // wall-clock stamp for [[history]] — observability only, nothing
    // replays or compares on it (generation numbers are the ordering)
    val stamped =
      if (meta.contains("ts")) meta
      else meta + ("ts" -> System.currentTimeMillis().toString)
    val body = (("token" -> token) +: stamped.toSeq.sorted)
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    if (!store(dir).putIfAbsent(markerOf(dir, gen), body.getBytes))
      throw new java.util.ConcurrentModificationException(
        s"generation $gen of $dir was committed by a concurrent writer; " +
          "recompute from the new committed base and retry")
    // the commit is durable; the rollup is an observer of it (see the
    // checkpointing section) — a failure here costs resolution speed,
    // never correctness, so it must not make the commit look failed
    if (gen > 0 && gen % checkpointInterval == 0) {
      try writeCheckpoint(dir, gen)
      catch {
        case scala.util.control.NonFatal(e) => System.err.println(
          s"[graft] commit-log checkpoint at $dir g$gen failed " +
            s"(resolution falls back to the listing path): $e")
      }
    }
  }

  /** Per-file stats computed from the WRITTEN files themselves
    * (input_file_name grouping) — the manifest can't drift from the
    * bytes on disk the way writer-side bookkeeping could. min/max
    * keep each column's NATIVE type (long, string, date, …): range
    * pruning is ordering-based, not numeric, so a string-keyed
    * dimension prunes exactly like a numeric one (range-partitioned
    * writes give contiguous lexicographic spans per file).
    *
    * Columns statted: the key (as `min_<key>`/`max_<key>`) plus every
    * numeric/date/timestamp column — Delta's per-column data-skipping
    * stats at this layer, consumed by [[scanWhere]]. Non-key string
    * columns are NOT statted (unbounded text would bloat the
    * manifest even truncated — a text-valued column's spans prune
    * nothing anyway).
    *
    * String-typed stats (a string KEY — urls, composite names) are
    * TRUNCATED to a [[statsTruncLen]]-char bound (Delta's discipline):
    * a 2 kB url must not ride every manifest row and broadcast twice
    * over. min truncates to the prefix (a prefix is ≤ its string —
    * still a lower bound); max becomes [[truncUpperBound]] — the
    * prefix with its rightmost ASCII char incremented and the tail
    * dropped, an upper bound for EVERY string sharing the prefix.
    * Both only ever WIDEN the file's [min, max] band, so every
    * consumer stays sound by the null-admits argument: scanWhere /
    * GraftFileIndex / merge banding include a file they could have
    * pruned (never the reverse), and deleteWhere's all-match proof
    * demands [minT, maxT] ⊆ band, which a widened band only makes
    * harder to satisfy.
    *
    * `nn_<c>` is the per-file NON-NULL count (Delta's nullCount,
    * inverted): min/max ignore nulls, so [min, max] ⊆ band proves
    * every NON-NULL value matches but says nothing about null rows —
    * [[deleteWhere]]'s metadata-only drop additionally needs
    * `nn_c == n_rows` to prove the file has no null (hence no
    * predicate-unknown, hence surviving) row. A manifest predating
    * this column simply never proves full coverage and falls back to
    * the rewrite path — sound, just less pruned.
    */
  private def statsOf(s: SparkSession, dataDir: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val df = s.read.parquet(dataDir)
    val statted = df.schema.fields.filter { f =>
      f.name == keyCol || (f.dataType match {
        case _: NumericType | DateType | TimestampType => true
        case _ => false
      })
    }.map(_.name).distinct.toSeq
    val aggs = count(lit(1)).as("n_rows") +:
      statted.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        count(col(c)).as(s"nn_$c")))
    val base = df.groupBy(input_file_name().as("path"))
      .agg(aggs.head, aggs.tail: _*)
    // string stats carry truncated BOUNDS, not values (scaladoc above);
    // a driver-side UDF is fine here — the manifest is file-count-sized
    val stringStatted = df.schema.fields
      .filter(f => statted.contains(f.name) && f.dataType == StringType)
      .map(_.name)
    stringStatted.foldLeft(base) { (acc, c) =>
      acc.withColumn(s"min_$c", substring(col(s"min_$c"), 1, statsTruncLen))
        .withColumn(s"max_$c", truncUpperUdf(col(s"max_$c")))
    }
  }

  /** Truncated UPPER bound for string stats: identity when the value
    * already fits [[statsTruncLen]]; otherwise the prefix with its
    * RIGHTMOST char < 0x7f incremented and everything after it
    * dropped — comparison against any string sharing the prefix is
    * decided at that position, so the bound dominates all of them.
    * Increment stays inside ASCII, where code-point order equals the
    * UTF-8 byte order Spark's UTF8String comparisons use (bumping
    * into 0x80+, or splitting a surrogate pair, could produce a bound
    * that mis-sorts); a prefix with no incrementable char (degenerate
    * non-ASCII key) yields NULL — the can't-prune-but-sound value
    * every stats consumer already honors for missing stats.
    */
  private[operators] val statsTruncLen = 32
  private[operators] def truncUpperBound(v: String): String =
    if (v == null || v.length <= statsTruncLen) v
    else {
      val p = v.substring(0, statsTruncLen).toCharArray
      var i = p.length - 1
      while (i >= 0 && p(i) >= 0x7f) i -= 1
      if (i < 0) null
      else new String(p, 0, i) + (p(i) + 1).toChar
    }
  private val truncUpperUdf = udf(truncUpperBound _)

  private def hasParquetFiles(dataDir: String): Boolean = {
    val p = java.nio.file.Path.of(dataDir)
    java.nio.file.Files.exists(p) && {
      val s = java.nio.file.Files.list(p)
      try s.anyMatch(f => f.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
  }

  /** Metadata-only commit: carry the current manifest forward
    * UNCHANGED (per-file COPIES — the manifest is file-count-sized
    * KBs, the data is untouched) under a fresh generation whose
    * commit meta is `meta`. The no-op maintenance-commit shape — a
    * governance stamp, an empty micro-batch — and the ckpt scale
    * probe's generator: it exercises the real [[commitGen]] path
    * (OCC link, checkpoint rollups) at metadata-only cost. Copies,
    * not hard links, deliberately: consecutive carries would pile
    * link counts onto ONE inode until the filesystem's EMLINK cap
    * (~65k on ext4 — the 10^5-commit probe found it), and copies are
    * what an object-store port does anyway. Returns the new
    * generation.
    */
  private[graft] def commitCarryForward(dir: String,
                                        meta: Map[String, String]): Int = {
    val prev = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val prevToken = metaAt(dir, prev).getOrElse("token",
      sys.error(s"commit-log entry for generation $prev lacks a token"))
    val token = newToken()
    val src = java.nio.file.Path.of(manifestDirOf(dir, prev, prevToken))
    val dst = java.nio.file.Path.of(manifestDirOf(dir, prev + 1, token))
    java.nio.file.Files.createDirectories(dst)
    val ls = java.nio.file.Files.list(src)
    try ls.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
      .foreach(f => java.nio.file.Files.copy(f, dst.resolve(f.getFileName)))
    finally ls.close()
    try commitGen(dir, prev + 1, token,
      inheritDvMeta(dir, prev) ++ meta ++
        schemaAt(dir, prev).map(s => "schema" -> s.json))
    catch {
      case e: java.util.ConcurrentModificationException =>
        graft.IndexLifecycle.deleteRecursively(dst.toString)
        throw e
    }
    prev + 1
  }

  // ---- write / read ----

  /** Materialize `df` as generation 0 of a keyed table: range-written
    * on the key into ≤ `nFiles` files (range, not hash — contiguous
    * per-file key spans are what make min/max pruning selective),
    * stats manifest, marker commit.
    */
  def write(s: SparkSession, df: DataFrame, keyCol: String, dir: String,
            nFiles: Int = 16, meta: Map[String, String] = Map.empty): Unit = {
    graft.IndexLifecycle.deleteRecursively(dir)
    val token = newToken()
    df.repartitionByRange(nFiles, col(keyCol))
      .write.parquet(dataDirOf(dir, 0, token))
    statsOf(s, dataDirOf(dir, 0, token), keyCol)
      .coalesce(1).write.parquet(manifestDirOf(dir, 0, token))
    commitGen(dir, 0, token,
      Map("op" -> "write") ++ meta + ("schema" -> df.schema.json))
  }

  /** Z-ORDER clustered write: generation 0 laid out on the Morton
    * (bit-interleaved) order of `clusterCols`, so EVERY clustered
    * column gets contiguous-ish per-file spans and [[scanWhere]]
    * prunes on any of them — the reason Delta/Iceberg OPTIMIZE
    * ZORDER exists. A key-range write makes one column perfectly
    * selective and the rest useless; z-order makes d columns each
    * ~file^(1/d) selective, which is the right trade for a 100 TB
    * fact table filtered by (date, customer) or (tenant, time).
    *
    * Each cluster column is normalized to a 16-bit lattice by global
    * min/max (one tiny agg), then bits are spread and interleaved
    * with the classic mask-shift cascade — pure Column arithmetic,
    * codegen'd, no UDF. Ties/skew degrade gracefully: the z-value
    * only DRIVES the range partitioner, correctness never depends on
    * it (stats are computed from the written files as always).
    * Subsequent [[merge]]s stay correct on any layout (pruning reads
    * the key stats), but rewrite files key-ordered — re-cluster with
    * a fresh writeClustered (OPTIMIZE ZORDER's exact lifecycle).
    */
  def writeClustered(s: SparkSession, df: DataFrame, keyCol: String,
                     clusterCols: Seq[String], dir: String,
                     nFiles: Int = 16): Unit = {
    zValueOf(df, clusterCols) match {
      case None => // empty input (or all-null cluster col): nothing to interleave
        write(s, df, keyCol, dir, nFiles)
      case Some(zv) =>
        graft.IndexLifecycle.deleteRecursively(dir)
        val token = newToken()
        df.withColumn("__zv", zv)
          .repartitionByRange(nFiles, col("__zv"))
          .drop("__zv")
          .write.parquet(dataDirOf(dir, 0, token))
        statsOf(s, dataDirOf(dir, 0, token), keyCol)
          .coalesce(1).write.parquet(manifestDirOf(dir, 0, token))
        commitGen(dir, 0, token, Map("op" -> "cluster",
          "cluster_cols" -> clusterCols.mkString(","),
          "schema" -> df.schema.json))
    }
  }

  /** The Morton (bit-interleaved) order key over `clusterCols`, or
    * None when there is nothing to interleave (empty input / all-null
    * cluster column). One tiny bounds agg; the z-value itself is pure
    * Column arithmetic (codegen'd, zero UDF). Shared by
    * [[writeClustered]] (gen-0 creation) and [[recluster]] (in-place
    * maintenance).
    */
  private def zValueOf(df: DataFrame, clusterCols: Seq[String]): Option[Column] = {
    require(clusterCols.nonEmpty && clusterCols.size <= 3,
      s"z-order wants 1-3 cluster columns, got ${clusterCols.size}")
    clusterCols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order cluster column '$c' must be numeric " +
          "(lattice normalization is min/max arithmetic)")
    }
    val boundExprs = clusterCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(boundExprs.head, boundExprs.tail: _*).head()
    if (bounds.anyNull) None
    else Some(zValueWithBounds(clusterCols,
      clusterCols.indices.map(i =>
        (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1)))))
  }

  /** The Morton interleave against EXPLICIT lattice bounds —
    * [[zValueOf]]'s core, also driven by [[reclusterPartial]] with
    * GLOBAL bounds off the manifest: a partial rewrite must fold its
    * rows into the TABLE's z space (so its output files tile the same
    * lattice the carried files do), not a lattice renormalized to the
    * degraded subset, which would coarsen per-dimension selectivity
    * exactly where the layout was being repaired.
    */
  private def zValueWithBounds(clusterCols: Seq[String],
                               bounds: Seq[(Double, Double)]): Column = {
    // d ≤ 3: 16 lattice bits × d + (d-1) lane offset must stay below
    // bit 63 — a sign-bit z-value would break the range order
    require(clusterCols.nonEmpty && clusterCols.size <= 3,
      s"z-order wants 1-3 cluster columns, got ${clusterCols.size}")
    // 16-bit lattice coordinate per column, then spread bits so each
    // occupies every d-th position (d-way Morton interleave)
    def lattice(c: String, i: Int): Column = {
      val (lo, hi) = bounds(i)
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(((col(c).cast("double") - lit(lo)) / lit(span) * 65535.0)
        .cast("long"), lit(0L)), lit(65535L))
    }
    val d = clusterCols.size
    def spread(x0: Column): Column =
      if (d == 1) x0
      else {
        // mask-shift cascade generalized to stride d: after step for
        // shift s (8,4,2,1), bit b sits at position b*d (for d<=3,
        // 16 source bits + lane offset stay below the sign bit)
        Seq(8, 4, 2, 1).foldLeft(x0) { (x, sft) =>
          val spreadX = x.bitwiseOR(shiftleft(x, sft * (d - 1)))
          // keep a bit only where a source bit belongs after this pass
          val mask = (0 until 16).map { b =>
            val pos = (b / sft) * sft * d + (b % sft)
            1L << pos
          }.foldLeft(0L)(_ | _)
          spreadX.bitwiseAND(lit(mask))
        }
      }
    clusterCols.zipWithIndex.map { case (c, i) =>
      shiftleft(spread(lattice(c, i)), i)
    }.reduce(_ bitwiseOR _)
  }

  /** OPTIMIZE ZORDER in place (Delta's maintenance shape): rewrite
    * every live file laid out on the Morton order of `clusterCols`,
    * committed as a NEW generation under the same OCC link.
    * [[writeClustered]] is the gen-0 creation path; this is what runs
    * in the maintenance window after merges/updates have strewn
    * key-ordered band files across the z layout. Rows are logically
    * identical, so the CDC feed across a recluster nets to ZERO
    * changes even though every physical file is replaced — layout, like
    * compaction, must be invisible to readers and tailers. Cost ∝ the
    * table (it IS a full rewrite); the payoff is every subsequent
    * scanWhere/readIndexed band on any clustered dimension. Time
    * travel to pre-recluster generations keeps working until vacuum.
    */
  def recluster(s: SparkSession, dir: String, keyCol: String,
                clusterCols: Seq[String], nFiles: Int = 16): MergeStats = {
    val prevGen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val next = prevGen + 1
    val token = newToken()
    val df = readTable(s, dir, asOf = Some(prevGen))
    val prevPaths = manifestAt(s, dir, prevGen).select("path").collect()
      .map(_.getString(0)).toIndexedSeq
    val staging = dataDirOf(dir, next, token)
    zValueOf(df, clusterCols) match {
      case Some(zv) =>
        df.withColumn("__zv", zv)
          .repartitionByRange(nFiles, col("__zv")).drop("__zv")
          .write.parquet(staging)
      case None => // degenerate input: fall back to key order
        df.repartitionByRange(nFiles, col(keyCol)).write.parquet(staging)
    }
    val newStats =
      if (hasParquetFiles(staging)) statsOf(s, staging, keyCol)
      else manifestAt(s, dir, prevGen).filter(lit(false))
    newStats.coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    try commitGen(dir, next, token, Map("op" -> "cluster",
      "cluster_cols" -> clusterCols.mkString(",")) ++
      schemaAt(dir, prevGen).map(sch => Map("schema" -> sch.json)).getOrElse(Map.empty))
    catch {
      case e: java.util.ConcurrentModificationException =>
        Seq(staging, manifestDirOf(dir, next, token))
          .foreach(graft.IndexLifecycle.deleteRecursively)
        throw e
    }
    maintainBloomSidecars(s, dir, next, staging)
    MergeStats(next, prevPaths, Nil) // everything rewrote, nothing carried
  }

  /** Partial OPTIMIZE ZORDER — the real maintenance cadence at
    * 100 TB: rewrite ONLY the files that DEGRADED the z layout since
    * the last clustering commit (merge/update/compact outputs land
    * key-ordered, not z-ordered), folding them back into the Morton
    * order while every still-clustered file carries to the new
    * manifest BY REFERENCE, bytes untouched. Cost ∝ the degradation,
    * never the table — a day's merge against a year's fact table
    * re-optimizes the day. [[recluster]] stays the full-rewrite path
    * (first-ever clustering, or a deliberate global re-sort).
    *
    * The baseline is the newest commit tagged `op=cluster` (write-
    * clustered gen 0, a full recluster, or a previous partial):
    * degraded = live files NOT in that commit's manifest. With no
    * cluster commit in the history (or its manifest vacuumed) every
    * live file is degraded and this degenerates to [[recluster]]'s
    * full rewrite — correct, just not partial. The rewrite's z-values
    * normalize over the GLOBAL manifest min/max bounds (a driver-side
    * file-count-sized agg — see `globalBounds` below), so the folded
    * files tile the TABLE's z space, not a lattice renormalized to
    * the degraded subset; only when a cluster column's manifest stats
    * are missing or non-castable does it fall back to the subset's
    * own bounds, which costs selectivity, never correctness (per-file
    * stats are computed from the written bytes as always, so
    * admission never depends on the lattice). The commit is tagged
    * `op=cluster`, so the NEXT partial recluster treats this
    * generation as its baseline. Content is logically identical —
    * CDC across the commit nets to zero — and a no-op (nothing
    * degraded) does not advance the generation.
    */
  def reclusterPartial(s: SparkSession, dir: String, keyCol: String,
                       clusterCols: Seq[String], nFiles: Int = 0): MergeStats = {
    val prevGen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    // same validation as the full paths (zValueOf) — the manifest-
    // bounds shortcut below must not silently accept a string column
    // whose stats happen to cast (null z-values, degenerate layout)
    require(clusterCols.nonEmpty && clusterCols.size <= 3,
      s"z-order wants 1-3 cluster columns, got ${clusterCols.size}")
    schemaAt(dir, prevGen).foreach(sch => clusterCols.foreach { c =>
      require(sch.fields.find(_.name.equalsIgnoreCase(c))
        .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]),
        s"z-order cluster column '$c' must be numeric " +
          "(lattice normalization is min/max arithmetic)")
    })
    val man0 = manifestAt(s, dir, prevGen)
    val livePaths = man0.select("path").collect()
      .map(_.getString(0)).toIndexedSeq
    // the baseline must be a cluster commit on the SAME columns:
    // carrying files tiled in a DIFFERENT z-space as "still
    // clustered" would report the layout repaired while the carried
    // majority prunes nothing on the requested dimensions — a
    // mismatched history instead degrades to the full rewrite. A
    // legacy cluster commit with NO cluster_cols tag is treated the
    // same way (non-matching): its columns are unknown, and assuming
    // they match ANY request is exactly the silent-selectivity-loss
    // this check exists to prevent.
    val wanted = clusterCols.mkString(",")
    val baseline: Set[String] =
      (prevGen to 0 by -1).find { g =>
        val m = metaAt(dir, g)
        m.get("op").contains("cluster") &&
          m.get("cluster_cols").contains(wanted)
      }.flatMap { g =>
        scala.util.Try(manifestAt(s, dir, g).select("path").collect()
          .map(_.getString(0)).toSet).toOption // vacuumed baseline: full rewrite
      }.getOrElse(Set.empty)
    val degraded = livePaths.filterNot(baseline.contains)
    val carried = livePaths.filter(baseline.contains)
    if (degraded.isEmpty)
      return MergeStats(prevGen, Nil, carried) // layout already optimal
    val next = prevGen + 1
    val token = newToken()
    val staging = dataDirOf(dir, next, token)
    val df = readVisible(s, dir, prevGen, degraded)
    val outFiles = if (nFiles > 0) nFiles else math.max(1, degraded.size)
    // GLOBAL lattice bounds off the manifest stats (driver-side,
    // file-count-sized, zero data scan): the rewrite must tile the
    // TABLE's z space, not a lattice renormalized to the degraded
    // subset — see zValueWithBounds. Missing/null stats (or a
    // non-double-castable stat type) fall back to subset bounds,
    // which only costs selectivity, never correctness.
    val globalBounds: Option[Seq[(Double, Double)]] =
      if (!clusterCols.forall(c => man0.columns.contains(s"min_$c"))) None
      else {
        val aggs = clusterCols.flatMap(c => Seq(
          min(col(s"min_$c").cast("double")), max(col(s"max_$c").cast("double"))))
        val r = man0.agg(aggs.head, aggs.tail: _*).head()
        if (r.anyNull) None
        else Some(clusterCols.indices.map(i =>
          (r.getDouble(2 * i), r.getDouble(2 * i + 1))))
      }
    val zv = globalBounds
      .map(b => zValueWithBounds(clusterCols, b))
      .orElse(zValueOf(df, clusterCols))
    zv match {
      case Some(z) =>
        df.withColumn("__zv", z)
          .repartitionByRange(outFiles, col("__zv")).drop("__zv")
          .write.parquet(staging)
      case None => // degenerate fold set: key order
        df.repartitionByRange(outFiles, col(keyCol)).write.parquet(staging)
    }
    val newStats =
      if (hasParquetFiles(staging)) statsOf(s, staging, keyCol)
      else man0.filter(lit(false))
    man0.filter(col("path").isin(carried: _*))
      .unionByName(newStats, allowMissingColumns = true)
      .coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    val dvMeta = dvMetaForCommit(s, dir, prevGen, next, token, degraded)
    try commitGen(dir, next, token, Map("op" -> "cluster",
      "cluster_cols" -> wanted,
      "partial" -> degraded.size.toString) ++ dvMeta ++
      schemaAt(dir, prevGen).map(sch => Map("schema" -> sch.json)).getOrElse(Map.empty))
    catch {
      case e: java.util.ConcurrentModificationException =>
        Seq(staging, manifestDirOf(dir, next, token), s"$dir/${dvNameOf(next, token)}")
          .foreach(graft.IndexLifecycle.deleteRecursively)
        throw e
    }
    maintainBloomSidecars(s, dir, next, staging)
    MergeStats(next, degraded, carried)
  }

  def manifest(s: SparkSession, dir: String): DataFrame = {
    val g = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    manifestAt(s, dir, g)
  }

  /** A specific generation's manifest. Valid for any `gen` ≤ the
    * committed one whose manifest a vacuum hasn't dropped — an
    * UNcommitted `manifest-g<next>` left by a crashed merge is never
    * readable through here, readers can't see past the marker.
    */
  def manifestAt(s: SparkSession, dir: String, gen: Int): DataFrame = {
    val committed = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    require(gen <= committed,
      s"generation $gen not committed yet (table is at $committed)")
    val token = metaAt(dir, gen).getOrElse("token",
      sys.error(s"commit-log entry for generation $gen lacks a token"))
    val mdir = manifestDirOf(dir, gen, token)
    require(java.nio.file.Files.exists(java.nio.file.Path.of(mdir)),
      s"generation $gen unavailable: its manifest was vacuumed")
    s.read.parquet(mdir)
  }

  /** The table's rows: exactly the files the committed manifest
    * references (which may span generations). `asOf` time-travels to
    * an earlier committed generation — available until a vacuum drops
    * the non-current manifests (Delta/Iceberg's exact trade).
    */
  def readTable(s: SparkSession, dir: String, asOf: Option[Int] = None): DataFrame = {
    val gen = asOf.getOrElse(committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)")))
    val paths = manifestAt(s, dir, gen).select("path").collect().map(_.getString(0))
    if (paths.isEmpty) { // fully-deleted table: empty frame, log schema
      val sch = schemaAt(dir, gen).getOrElse(sys.error(
        s"$dir generation $gen is empty and its commit-log entry has no schema"))
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
    }
    // log-recorded schema (no footer pass); a manifest may span
    // generations with evolved schemas — pre-evolution files surface
    // the newer columns as null under the explicit read schema.
    // Deletion-vector rows hide here; only vectored files pay the
    // anti-join (see readVisible), none on a vector-free table.
    readVisible(s, dir, gen, paths.toIndexedSeq)
  }

  /** The table through [[GraftFileIndex]]: Catalyst pushes the
    * query's own filters into the file listing, so ANY predicate over
    * statted columns prunes files at plan time — no explicit
    * scanWhere call, `.filter` just works, and `.explain` shows the
    * scan's file count shrink. This is the integration Delta/Iceberg
    * ride (FileSourceScanExec hands dataFilters to
    * FileIndex.listFiles); [[readTable]] stays the dependency-free
    * multi-path read, [[scanWhere]] the explicit manifest consult.
    * Index construction is driver-side and file-count-sized: one
    * getFileStatus per live file plus the already-collected manifest.
    */
  def readIndexed(s: SparkSession, dir: String, asOf: Option[Int] = None): DataFrame = {
    val man = asOf.fold(manifest(s, dir))(g => manifestAt(s, dir, g))
    val rows = man.collect()
    if (rows.isEmpty) return readTable(s, dir, asOf)
    val statCols = man.columns.filter(_.startsWith("min_")).map(_.stripPrefix("min_")).toSeq
    val hconf = s.sparkContext.hadoopConfiguration
    val entries = rows.toIndexedSeq.map { r =>
      val p = new org.apache.hadoop.fs.Path(java.net.URI.create(r.getAs[String]("path")))
      val stats = statCols.map(c =>
        c -> ((r.getAs[Any](s"min_$c"), r.getAs[Any](s"max_$c")))).toMap
      GraftFileIndex.Entry(p.getFileSystem(hconf).getFileStatus(p), stats)
    }
    val gen = asOf.getOrElse(committedGen(dir).get)
    val dataSchema = schemaAt(dir, gen).getOrElse { // pre-schema-log fallback
      val paths = rows.map(_.getAs[String]("path")).toIndexedSeq
      s.read.option("mergeSchema", "true").parquet(paths: _*).schema
    }
    def planOf(es: IndexedSeq[GraftFileIndex.Entry]): DataFrame = {
      val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        new GraftFileIndex(es),
        partitionSchema = new org.apache.spark.sql.types.StructType(),
        dataSchema = dataSchema,
        bucketSpec = None,
        fileFormat = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
        options = Map.empty)(s)
      org.apache.spark.sql.graftbridge.SessionBridge.ofPlan(s,
        org.apache.spark.sql.execution.datasources.LogicalRelation(relation))
    }
    // deletion-vector rows hide here too, with readVisible's split:
    // clean files keep the raw stat-pruned relation (zero tax), only
    // vectored files ride the anti-join (`_metadata` resolves through
    // HadoopFsRelation like any file source); both halves stay behind
    // GraftFileIndex, so Catalyst still prunes each by the query's
    // own filters
    dvFrameAt(s, dir, gen) match {
      case None => planOf(entries)
      case Some(dv) =>
        val dirtyNorm = dv.select("path").distinct().collect()
          .map(r => normPath(r.getString(0))).toSet
        val (dirty, clean) = entries.partition(e =>
          dirtyNorm.contains(normPath(e.status.getPath.toString)))
        if (dirty.isEmpty) planOf(entries)
        else if (clean.isEmpty) dvAntiJoin(planOf(dirty), dv)
        else planOf(clean).unionByName(dvAntiJoin(planOf(dirty), dv))
    }
  }

  /** Data-skipping scan: a range read over ANY statted column that
    * consults the manifest FIRST and opens only files whose
    * [min_c, max_c] intersects [lo, hi] — the table-layer half of
    * predicate pushdown. Parquet row-group stats prune WITHIN a file
    * the engine already opened; this prunes at the FILE list, so a
    * 100 TB table's footer reads and scheduling cost scale with the
    * band, not the table. The residual filter still applies (manifest
    * ranges admit whole files), so results are exact.
    *
    * Pruning is sound under missing stats: a manifest entry whose
    * stats for `colName` are null (a pre-evolution file carried
    * across the evolution that introduced the column, or a column the
    * writer doesn't stat) is INCLUDED, never skipped. Selectivity on
    * a non-key column depends on the physical clustering —
    * range-written tables cluster only the key; [[writeClustered]]'s
    * z-order makes multiple columns selective at once.
    */
  def scanWhere(s: SparkSession, dir: String, colName: String,
                lo: Any, hi: Any): DataFrame = {
    val man = manifest(s, dir)
    val (minC, maxC) = (s"min_$colName", s"max_$colName")
    val admit =
      if (!man.columns.contains(minC)) lit(true) // unstatted: no pruning
      else (col(maxC).isNull || col(maxC) >= lit(lo)) &&
        (col(minC).isNull || col(minC) <= lit(hi))
    val paths = man.filter(admit)
      .select("path").collect().map(_.getString(0)).toIndexedSeq
    val gen = committedGen(dir).get
    if (paths.nonEmpty)
      readVisible(s, dir, gen, paths)
        .filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
    else { // band misses every file: empty result, schema from any live file
      val any = man.select("path").limit(1).collect()
      if (any.isEmpty) sys.error(s"$dir is empty; no schema for an empty scan")
      readerFor(s, dir, gen).parquet(any.head.getString(0)).limit(0)
    }
  }

  /** Key-band scan — [[scanWhere]] on the table's merge key. */
  def scanRange(s: SparkSession, dir: String, keyCol: String,
                lo: Any, hi: Any): DataFrame =
    scanWhere(s, dir, keyCol, lo, hi)

  /** Incremental-consumer cursor over the commit log: everything that
    * changed since the consumer's `lastSeenGen`, or None when up to
    * date. The consumer loop a downstream index / feature store /
    * replica runs is three lines:
    * {{{
    *   var cur = 0
    *   MergeTable.pollChanges(s, dir, cur, "k").foreach { case (g, delta) =>
    *     applyDelta(delta); cur = g }
    * }}}
    * The delta is [[changesBetween]]'s NET logical diff (time ∝ files
    * rewritten in the span, never the table), and the generation
    * number is the exactly-once watermark: persist `cur` beside the
    * applied state and replay is idempotent. Polling the log is one
    * pointer read plus a short tail probe (see the checkpointing
    * section) — no Spark job, no listing, when nothing changed.
    */
  /** The change feed as a Structured Streaming source (see
    * [[graft.sources.CdcSourceProvider]]): each committed generation
    * becomes a checkpointed micro-batch of net logical changes.
    * `startGen = -1` requests snapshot-then-follow (first batch =
    * whole table as inserts). [[pollChanges]] is the pull API for
    * driver loops; this is the push API for `readStream` topologies.
    */
  // ---- per-file Bloom sidecar (point-lookup pruning on ANY column) ----
  //
  // min/max stats prune RANGE predicates on clustered columns; they are
  // useless for `col = value` on a high-cardinality column uncorrelated
  // with the layout (a url, a content hash, a customer email) — every
  // file's [min, max] spans the whole domain. Delta solves this with
  // per-file Bloom filter indexes; same design here: one mergeable
  // graft_bloom sketch per live data file, built in ONE pass over the
  // table (map-side-combined groupBy on input_file_name), stored as a
  // parquet sidecar named for the generation it covers. A point lookup
  // consults the sidecar (file-count-sized, like the manifest), opens
  // only files whose sketch admits the value, and applies the exact
  // residual filter. No false negatives by construction (bloom + the
  // uncovered-file fallback below), so results are exact; false
  // positives only cost an extra file open. At 100 TB / 100k files a
  // needle lookup touches the sidecar + a handful of files instead of
  // scheduling 100k scan tasks.

  /** Sidecar segment NAME: `_bloom-g<gen>~<k>b<numBits>~<col>`.
    * numBits rides the name (like numHashes) so maintenance folds
    * size FRESH sketches exactly as buildBloomIndex chose, even after
    * the table emptied or mixed-size segments folded; legacy `~<k>~`
    * names (pre-numBits) still parse with the size unknown. The name
    * is the segment's logical identity: pointer-published segments
    * (r14+) carry it as the pointer FILE name under `_bloomptr/`
    * while their parquet lives in an immutable tokened dir; legacy
    * segments carry it as the root DIRECTORY name.
    */
  private def bloomNameOf(colName: String, gen: Int,
                          numHashes: Int, numBits: Int) =
    s"_bloom-g$gen~${numHashes}b$numBits~$colName"

  /** One committed sidecar segment. `dataDir` is where the sketch
    * parquet actually lives — `<dir>/_bloomseg-<token>` when
    * pointer-published (`pointed`), `<dir>/<name>` for a legacy
    * pre-pointer segment.
    */
  private[operators] final case class BloomSeg(
      name: String, dataDir: String, gen: Int, k: Int,
      bits: Option[Int], col: String, pointed: Boolean)

  private def bloomPtrDirOf(dir: String): java.nio.file.Path =
    java.nio.file.Path.of(dir, "_bloomptr")
  private def bloomPtrOf(dir: String, name: String): java.nio.file.Path =
    bloomPtrDirOf(dir).resolve(name)

  private def parseBloomName(n: String): Option[(Int, Int, Option[Int], String)] =
    if (!n.startsWith("_bloom-g")) None
    else n.stripPrefix("_bloom-g").split("~", 3) match {
      // staged names are `<committed name>.tmp<token>` (legacy dir
      // staging) or `<committed name>.tmp-<nonce>` (the POSIX store's
      // pointer staging) — the suffix lands in the column segment, so
      // reject it explicitly or crashed staging would surface as a
      // committed segment for a phantom column (folded every commit,
      // reported in stats, copied by clones)
      case Array(g, kb, c) if !c.contains(".tmp") =>
        val (kStr, bits) = kb.indexOf('b') match {
          case -1 => (kb, None)
          case i  => (kb.take(i), kb.drop(i + 1).toIntOption)
        }
        for (gi <- g.toIntOption; ki <- kStr.toIntOption)
          yield (gi, ki, bits, c)
      case _ => None
    }

  /** Every committed sidecar segment under `dir` — the one discovery
    * point shared by probes, folds, sweeps, stats and clones so the
    * name/publication scheme lives in exactly one place. Two homes:
    *
    *  - POINTER-published (the CommitStore discipline): the segment
    *    name is a file under `_bloomptr/` whose bytes name the
    *    immutable tokened parquet dir. Publication was an atomic
    *    [[CommitStore.putReplace]], so a reader sees the old or the
    *    new pointer, never a torn one. A pointer whose target dir is
    *    missing (crashed flip raced a vacuum, or the target was
    *    vacuumed as an orphan) is skipped — degrades to uncovered-
    *    admit, and vacuum reclaims the dangling pointer.
    *  - LEGACY root dirs (`_bloom-g…` written by the pre-r14
    *    staged-dir-rename publish): still discovered so existing
    *    tables keep pruning; the next fold or rebuild republishes
    *    them through the pointer and sweeps the dir.
    *
    * On a name collision the pointer wins: the same-generation
    * rebuild's torn window (pointer flipped, legacy dir not yet
    * swept) must resolve to the fresh segment.
    */
  private[operators] def bloomDirs(dir: String): Seq[BloomSeg] = {
    val st = store(dir)
    val pointed = st.list(bloomPtrDirOf(dir)).flatMap { n =>
      parseBloomName(n).flatMap { case (g, k, b, c) =>
        st.read(bloomPtrOf(dir, n)) // None = swept mid-list
          .map(bytes => new String(bytes, "UTF-8").trim)
          .filter(_.nonEmpty)
          .map(seg => BloomSeg(n, s"$dir/$seg", g, k, b, c, pointed = true))
          // target gone = crashed flip or vacuumed orphan; the pointer
          // is reclaimed by vacuum, the probe falls back to uncovered
          .filter(s => java.nio.file.Files.exists(
            java.nio.file.Path.of(s.dataDir)))
      }
    }
    val root = java.nio.file.Path.of(dir)
    val legacy = if (!java.nio.file.Files.exists(root)) Nil else {
      val ls = java.nio.file.Files.list(root)
      val names = try ls.iterator().asScala.map(_.getFileName.toString).toSeq
                  finally ls.close()
      names.flatMap(n => parseBloomName(n).map { case (g, k, b, c) =>
        BloomSeg(n, s"$dir/$n", g, k, b, c, pointed = false) })
    }
    val pointedNames = pointed.map(_.name).toSet
    pointed ++ legacy.filterNot(s => pointedNames.contains(s.name))
  }

  /** Publish a segment: flip its pointer to `dataName` through the
    * store's atomic replace. The parquet under `dataName` was written
    * directly to its final tokened dir (data never moves — the
    * property that keeps the format object-store-ready), so the flip
    * is the only publication step and a crash on either side of it
    * leaves a consistent index: before = old segment intact, after =
    * new segment live and the stale data dir awaits vacuum's
    * orphan sweep.
    */
  private def publishBloomSeg(dir: String, name: String,
                              dataName: String): Unit =
    store(dir).putReplace(bloomPtrOf(dir, name),
      (dataName + "\n").getBytes("UTF-8"))

  /** Retire a superseded segment: pointer first (readers stop
    * resolving it atomically), data dir second. A crash between the
    * two leaves an orphaned `_bloomseg-` dir that vacuum reclaims as
    * unreferenced. `keepPtr` is for the same-NAME republish, where
    * the pointer was already flipped to the successor and must not
    * be deleted out from under it.
    */
  private def dropBloomSeg(dir: String, seg: BloomSeg,
                           keepPtr: Boolean = false): Unit = {
    if (seg.pointed && !keepPtr) { store(dir).delete(bloomPtrOf(dir, seg.name)); () }
    graft.IndexLifecycle.deleteRecursively(seg.dataDir)
  }

  // case-insensitive like Spark's own resolution (and the fold/probe
  // sides' type lookups) — dropColumn's sweep of 'tag' must find a
  // '_bloom-…~Tag' sidecar, and a probe on 'K' must find the segment
  // built as 'k', or maintenance keeps folding retired bytes forever
  private def bloomDirsFor(dir: String, colName: String): Seq[BloomSeg] =
    bloomDirs(dir).filter(_.col.equalsIgnoreCase(colName))

  /** Newest sidecar PER numHashes-family for `colName` at or below
    * `maxGen`: (dataDir, gen, numHashes). Normally one family; a
    * crashed rebuild that changed `numHashes` leaves two, and BOTH are
    * consulted by probes (each segment prunes its covered files
    * soundly with its own k) — coverage is never silently dropped.
    */
  private def bloomFamilyDirs(dir: String, colName: String,
                              maxGen: Int): Seq[(String, Int, Int)] =
    bloomDirsFor(dir, colName).filter(_.gen <= maxGen)
      .groupBy(_.k).values.toSeq
      .map(_.maxBy(_.gen))
      .map(s => (s.dataDir, s.gen, s.k))
      .sortBy(-_._2)

  /** XxHash64 of a probe value, computed with the SAME Catalyst
    * expression (and default seed) the build side's `xxhash64(col)`
    * uses — the two must agree bit-for-bit or pruning would lie. The
    * probe literal is first CAST to the column's type: XxHash64 hashes
    * an Int and a Long differently, so probing a long column with
    * `5: Int` would otherwise false-negative every sketch while the
    * residual `===` (which coerces) would have matched.
    */
  private def bloomProbeHash(value: Any,
      colType: Option[org.apache.spark.sql.types.DataType],
      timeZone: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
    val lit0 = Literal(value)
    // cast under the SESSION time zone — the residual filter coerces a
    // string-vs-timestamp probe there, and sketch admission must probe
    // the same instant or timestamp lookups silently lose rows
    val e = colType.filter(_ != lit0.dataType)
      .map(t => Cast(lit0, t, Some(timeZone))).getOrElse(lit0)
    XxHash64(Seq(e), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Long]
  }

  /** Build (or rebuild) the Bloom sidecar for `colName` at the current
    * generation: one Spark job, one sketch per live file. Supersedes
    * any older sidecar for the column. Publication is the CommitStore
    * discipline (parquet written once to an immutable tokened dir,
    * then one atomic pointer flip — [[publishBloomSeg]]) so a crash
    * leaves either the old or the new index, never a torn one, on
    * POSIX and object stores alike. Returns the generation the index
    * covers. Files written by LATER commits are simply uncovered —
    * [[bloomCandidatePaths]] admits them, so a stale index degrades
    * to less pruning, never to wrong answers (rebuild on maintenance
    * windows, like compaction).
    */
  def buildBloomIndex(s: SparkSession, dir: String, colName: String,
                      numBits: Int = 1 << 17, numHashes: Int = 7): Int = {
    val gen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val idx = readTable(s, dir)
      .select(input_file_name().as("path"), xxhash64(col(colName)).as("__h"))
      .groupBy("path")
      .agg(graft.functions.GraftFunctions.bloomAgg("__h", numBits, numHashes)
        .as("bloom"))
    val segName = bloomNameOf(colName, gen, numHashes, numBits)
    val dataName = s"_bloomseg-${newToken()}"
    // NOT coalesced to one file: sketches are numBits/8 bytes each, so
    // a big table's sidecar is tens of MB — probes re-read it per
    // lookup and want the read parallel (the groupBy's partitioning
    // spreads entries across ≤ shuffle.partitions part files)
    idx.write.parquet(s"$dir/$dataName")
    // snapshot the superseded set BEFORE the flip (the same-name
    // replace needs the OLD target; after the flip the pointer names
    // the new one), publish, THEN sweep — a crash mid-build leaves the
    // old index intact (the fresh data dir is an orphan vacuum
    // reclaims), a crash mid-sweep leaves both (discovery takes the
    // pointer / the higher generation per family). The sweep is
    // restricted to STRICTLY LOWER generations plus this builder's own
    // replacements: a concurrent builder that already landed a fresher
    // index (higher gen) must not lose it to this builder's cleanup.
    // One torn window remains, sound (probes fall back to full
    // admission) but noted so operators don't schedule concurrent
    // rebuilds of one column: a same-generation build with a different
    // numHashes leaves both segments until the next higher-generation
    // build sweeps them. The r13 same-generation-rebuild no-index gap
    // is GONE — the pointer flip is atomic where delete-then-rename
    // was not.
    val superseded = bloomDirsFor(dir, colName)
      .filter(t => t.gen < gen ||
        // a SAME-generation same-k sibling with different numBits is
        // also superseded (this rebuild fully covers the live set) —
        // leaving it would make the next fold read two segments of one
        // family and carry duplicate rows per path forever; the
        // mutual-delete risk of two concurrent same-column rebuilds
        // rides the already-documented don't-schedule-concurrent-
        // rebuilds window above
        (t.gen == gen && t.k == numHashes && !t.bits.contains(numBits)) ||
        t.name == segName)
    publishBloomSeg(dir, segName, dataName)
    superseded.foreach(seg =>
      dropBloomSeg(dir, seg, keepPtr = seg.name == segName))
    gen
  }

  /** Delta-maintain every existing Bloom sidecar at a DML commit:
    * sketch ONLY the committing generation's staged files (one pass
    * over files already in the page cache from being written), fold
    * them with the surviving entries of the current sidecar (a
    * file-count-sized parquet read — the sketch column is a monoid,
    * so old entries carry verbatim; dead files' rows are dropped),
    * and land the union as the generation-`newGen` sidecar under the
    * same write-once-then-pointer-flip discipline as
    * [[buildBloomIndex]]. Cost ∝ the
    * delta plus the sidecar, never the table — the same maintenance
    * discipline as appendToFpIndex/appendToIvfIndex, and the reason
    * the index stays ~fully covering under a steady merge diet
    * instead of decaying toward admit-all until a full rebuild.
    *
    * Runs AFTER the commit-log link has landed, so a failure here can
    * never un-commit data — it degrades to a stale (sound,
    * admit-uncovered) sidecar, is logged loudly, and
    * [[buildBloomIndex]] is the recovery. numHashes AND numBits ride
    * the newest segment's dir name, so fresh sketches are sized
    * exactly as the build chose; existing entries carry their own
    * byte length per-row, so segments built at different sizes still
    * fold (a legacy pre-numBits name sizes fresh sketches by the
    * LARGEST sketch in the fold frame). A segment with a DIFFERENT
    * numHashes (crashed rebuild that changed k) is left alive, not
    * swept — probes consult every k-family, so its coverage keeps
    * pruning instead of silently decaying to admit-all.
    * Crash-safety: a crash before the pointer flip leaves the old
    * sidecar intact (the staged data dir is an orphan vacuum
    * reclaims); a crash mid-sweep leaves both generations (probes
    * read the newest).
    */
  private def maintainBloomSidecars(s: SparkSession, dir: String,
                                    newGen: Int, staging: String): Unit = {
    val segs = bloomDirs(dir)
    if (segs.isEmpty) return
    val liveDf = manifestAt(s, dir, newGen).select("path")
    val stagedDf =
      if (hasParquetFiles(staging)) Some(s.read.parquet(staging)) else None
    segs.map(_.col).distinct.foreach { c =>
      try {
        val colSegs = segs.filter(_.col == c)
        // deterministic on a same-generation tie (crashed k-change
        // rebuild): highest k wins, so repeated folds pick ONE family
        val newest = colSegs.maxBy(t => (t.gen, t.k))
        val (newestGen, k, recordedBits) = (newest.gen, newest.k, newest.bits)
        if (newestGen < newGen) {
          // the fold family is the newest segment's numHashes — a
          // DIFFERENT-k segment (crashed rebuild that changed k) can't
          // fold in (admission probes with one k per segment), so it is
          // LEFT ALIVE, not swept: it still prunes its covered files
          // soundly, and bloomCandidatePathsIn consults every family
          val family = colSegs.filter(_.k == k)
          val foldDf = s.read.parquet(family.map(_.dataDir): _*)
          // one row per path: a crashed fold (new segment landed, old
          // not yet swept) leaves two same-k segments both covering
          // the carried files — every duplicate row is an equally
          // sound sketch of the same immutable file, so keep either,
          // but don't let duplicates compound through repeated folds
          val old = foldDf.join(broadcast(liveDf), Seq("path"), "left_semi")
            .dropDuplicates("path")
          // fresh-sketch numBits: the size buildBloomIndex recorded in
          // the newest segment's name; a legacy pre-numBits name falls
          // back to the LARGEST sketch in the fold frame (bits = 8 ×
          // bytes — max, not an arbitrary first row, so mixed-size
          // segments never undersize new files), and only an empty
          // legacy segment (fully-deleted table) uses the build default
          lazy val resolvedBits: Int = recordedBits.getOrElse {
            val r = foldDf.agg(max(length(col("bloom")))).head()
            if (r.isNullAt(0)) 1 << 17 else r.getInt(0) * 8
          }
          // case-insensitive like Spark's own resolution (and like the
          // probe side's type lookup) — a sidecar on 'Tag' must still
          // fold when the staged schema spells it 'tag'
          val fresh = stagedDf.filter(_.columns.exists(_.equalsIgnoreCase(c))).map { df =>
            df.select(input_file_name().as("path"),
                xxhash64(col(c)).as("__h"))
              .groupBy("path")
              .agg(graft.functions.GraftFunctions.bloomAgg("__h", resolvedBits, k)
                .as("bloom"))
          }
          val folded = fresh.fold(old)(f => old.unionByName(f))
          val segName = bloomNameOf(c, newGen, k, resolvedBits)
          val dataName = s"_bloomseg-${newToken()}"
          folded.write.parquet(s"$dir/$dataName")
          publishBloomSeg(dir, segName, dataName)
          family.filter(_.gen < newGen).foreach(seg =>
            dropBloomSeg(dir, seg, keepPtr = seg.name == segName))
          // surviving different-k segments are NOT logged per commit (a
          // streaming sink would print once per micro-batch, drowning
          // real maintenance errors) — the split is visible in
          // [[bloomFamilySplit]] / `table stats` until a full rebuild
          // collapses it
        }
      } catch {
        // the DML committed; a NON-FATAL maintenance failure must not
        // make it look failed (a retried merge would double-apply the
        // batch). The sidecar is merely stale — sound by the
        // uncovered-file fallback — and buildBloomIndex is the
        // recovery. Fatal VM errors and interruption still propagate:
        // the commit-is-durable argument doesn't justify masking a
        // dying JVM or breaking cooperative cancellation.
        case scala.util.control.NonFatal(e) => System.err.println(
          s"[graft] bloom sidecar maintenance for $dir.$c at g$newGen failed " +
            s"(index is stale-but-sound; rebuild with buildBloomIndex): $e")
      }
    }
  }

  /** The columns carrying a committed Bloom sidecar, with the
    * generation the newest segment covers (observability — the
    * `table stats` console verb and capacity planning; files written
    * after that generation are uncovered-admitted until the next
    * maintenance fold or rebuild).
    */
  def bloomIndexedColumns(dir: String): Map[String, Int] =
    bloomDirs(dir).groupBy(_.col).map { case (c, segs) => c -> segs.map(_.gen).max }

  /** Columns whose sidecar currently spans MORE than one numHashes
    * family (a crashed k-change rebuild's torn window): col → family
    * count. Probes stay sound — they consult every family — and a
    * full [[buildBloomIndex]] collapses the split; `table stats`
    * surfaces this instead of a per-commit warning (which would print
    * once per micro-batch under a streaming sink).
    */
  def bloomFamilySplit(dir: String): Map[String, Int] =
    bloomDirs(dir).groupBy(_.col).view
      .mapValues(_.map(_.k).distinct.size).filter(_._2 > 1).toMap

  /** The pruning decision for `colName = value`, exposed for specs and
    * probes: (candidate paths, pruned-file count, total live files).
    * Candidates = sidecar hits ∪ files the sidecar doesn't cover
    * (written after it, or no sidecar at all) — the sound fallback.
    * One tiny job over the file-count-sized sidecar; only (path,
    * boolean) rows reach the driver, never the sketches themselves.
    */
  def bloomCandidatePaths(s: SparkSession, dir: String, colName: String,
                          value: Any): (Seq[String], Int, Int) =
    bloomCandidatePathsIn(s, dir, colName, Seq(value))

  /** Batched admission: ONE sidecar pass decides per-file candidacy
    * for N values at once (the lookup-service shape — the index read
    * amortizes across the batch instead of being re-paid per needle).
    * Returns the UNION candidate set over all values. Batch size is
    * capped because the admission predicate is an N-term OR evaluated
    * per sketch row.
    */
  def bloomCandidatePathsIn(s: SparkSession, dir: String, colName: String,
                            values: Seq[Any]): (Seq[String], Int, Int) = {
    require(values.nonEmpty && values.size <= 1024,
      s"bloom probe batch must be 1..1024 values, got ${values.size}")
    val gen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val live = manifestAt(s, dir, gen).select("path").collect()
      .map(_.getString(0)).toIndexedSeq
    // normally ONE segment; after a crashed rebuild that changed
    // numHashes, the newest segment per k-family — each is sound for
    // the files it covers, so a file is pruned when ANY covering
    // segment misses (intersection of admissions), and coverage from
    // the pre-crash family keeps pruning instead of being discarded
    val families = bloomFamilyDirs(dir, colName, gen)
    if (families.isEmpty) (live, 0, live.size)
    else {
      // case-insensitive like Spark's own resolution — a probe on
      // 'K' against schema field 'k' must still find the type
      val colType = schemaAt(dir, gen)
        .flatMap(_.fields.find(_.name.equalsIgnoreCase(colName)))
        .map(_.dataType)
      val tz = s.sessionState.conf.sessionLocalTimeZone
      val admitMaps = families.map { case (idxDir, _, k) =>
        val anyHit = values.map(v =>
          graft.functions.GraftFunctions.bloomColMightContain(
            "bloom", bloomProbeHash(v, colType, tz), k)).reduce(_ || _)
        s.read.parquet(idxDir)
          .select(col("path"), anyHit.as("hit"))
          .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      }
      val cands = live.filter(p => admitMaps.forall(_.getOrElse(p, true)))
      (cands, live.size - cands.size, live.size)
    }
  }

  /** Point lookup `colName = value` through the Bloom sidecar: open
    * only the candidate files, then apply the exact residual filter
    * (sketch admission is per-FILE; the row filter still runs, also
    * pushed into the parquet scan). Exact results always — with no
    * sidecar this degrades to a full (filtered) table read.
    */
  def scanEqualsBloom(s: SparkSession, dir: String, colName: String,
                      value: Any): DataFrame =
    scanEqualsBloomIn(s, dir, colName, Seq(value))

  /** Batched point lookup `colName IN (values…)`: one sidecar pass,
    * one read over the union candidate set, exact residual IN filter.
    */
  def scanEqualsBloomIn(s: SparkSession, dir: String, colName: String,
                        values: Seq[Any]): DataFrame = {
    val (cands, _, _) = bloomCandidatePathsIn(s, dir, colName, values)
    val gen = committedGen(dir).get
    val base =
      if (cands.isEmpty) readTable(s, dir).limit(0)
      else readVisible(s, dir, gen, cands)
    base.filter(col(colName).isin(values: _*))
  }

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

  private def dvNameOf(gen: Int, token: String) = s"dv-g$gen~$token"

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

  private def normPath(p: String): String =
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
    m.get("dv").map(n => (n.split(',').toSeq.filter(_.nonEmpty),
      m.get("dv_rows").flatMap(_.toLongOption).getOrElse(-1L)))
  }

  private def dvFrameAt(s: SparkSession, dir: String, gen: Int): Option[DataFrame] = {
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
  private def dvAntiJoin(df: DataFrame, dv: DataFrame): DataFrame =
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
  private def readVisible(s: SparkSession, dir: String, gen: Int,
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
  private def dvMetaForCommit(s: SparkSession, dir: String, prevGen: Int,
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
  private def inheritDvMeta(dir: String, fromGen: Int): Map[String, String] = {
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
    val man = manifestAt(s, dir, prevGen)
    val allPaths = man.select("path").collect().map(_.getString(0)).toIndexedSeq
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
    // range join would be ambiguous
    val ranges = man.select(col("path").as("__mf_path"),
      col(s"min_$keyCol").as("__mn"), col(s"max_$keyCol").as("__mx"))
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
    man.coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    val prevRows = metaAt(dir, prevGen).get("dv_rows")
      .flatMap(_.toLongOption).getOrElse(0L)
    try commitGen(dir, next, token, Map("op" -> "dvdelete",
      "dv" -> newSegs.mkString(","),
      "dv_rows" -> (prevRows + fresh).toString,
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
    val touched = allPaths.filter(p => dvPaths.contains(normPath(p)))
    MergeStats(next, touched, allPaths.filterNot(touched.contains))
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
    val pathsA = manifestAt(s, dir, fromGen).select("path")
      .collect().map(_.getString(0)).toSet
    val pathsB = manifestAt(s, dir, toGen).select("path")
      .collect().map(_.getString(0)).toSet
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
    val dvChanged: IndexedSeq[String] = {
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
    val anyPath = (onlyA ++ onlyB ++ pathsA ++ pathsB).headOption.getOrElse(
      sys.error(s"$dir has no data files in either generation; no schema to diff"))
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
    val vcols = (o0.columns ++ n0.columns).distinct.filterNot(_ == keyCol)
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

  // ---- CDC retention horizons ----
  //
  // The retention contract ("don't vacuum past a stream's horizon")
  // used to be documentation-only: a vacuum could silently strand a
  // checkpointed stream until its next read failed. Consumers now
  // REGISTER their horizon — the oldest generation whose manifest (and
  // superseded files) a replay could still need — as one tiny file
  // per consumer (`_cdc_horizon-<consumer>`; per-consumer files, so
  // concurrent consumers never read-modify-write shared state), and
  // [[vacuum]] refuses to run while any registered horizon sits below
  // the committed generation unless forced. The graft-cdc streaming
  // source registers automatically (keyed by its checkpoint identity)
  // and advances its horizon as batches commit; pull consumers
  // ([[pollChanges]] loops) register explicitly.

  private def horizonFileOf(dir: String, consumer: String) = {
    require(consumer.matches("[A-Za-z0-9_\\-.]+"),
      s"consumer id '$consumer' must match [A-Za-z0-9_.-]+")
    // a consumer id whose file name would match the stores' EXACT
    // crash-staging nonce shape (`<final>.tmp-<pid>-<hexnanos>`,
    // [[PosixCommitStore.isStagingName]]) would be indistinguishable
    // from debris — invisible to [[cdcHorizons]] and swept by vacuum —
    // so it is refused HERE, loudly. Ids that merely CONTAIN `.tmp-`
    // (e.g. `nightly.tmp-replica`) are fine: the listing matches the
    // full nonce pattern, not the marker substring.
    require(!PosixCommitStore.isStagingName(s"_cdc_horizon-$consumer"),
      s"consumer id '$consumer' matches the stores' crash-staging nonce " +
        "pattern '.tmp-<pid>-<hexnanos>' and would read as debris")
    java.nio.file.Path.of(dir, s"_cdc_horizon-$consumer")
  }

  /** Record that `consumer` may still replay from generation `gen`
    * (atomic per-consumer write; later registrations replace earlier).
    */
  def registerCdcHorizon(dir: String, consumer: String, gen: Int): Unit =
    store(dir).putReplace(horizonFileOf(dir, consumer), s"$gen\n".getBytes("UTF-8"))

  /** Registered consumers and their horizons. A name matching the
    * stores' EXACT staging-nonce shape ([[PosixCommitStore
    * .isStagingName]] — `<final>.tmp-<pid>-<hexnanos>`) is a crashed
    * registration's debris, which this prefix filter would otherwise
    * parse as a live consumer with a frozen generation — permanently
    * tripping [[vacuum]]'s guard, which throws BEFORE the sweep that
    * cleans such debris; skipped here, reclaimed by vacuum's
    * crash-staging branch. The match is the full nonce pattern, not
    * `.tmp-` anywhere: a pre-r13 registration like
    * `nightly.tmp-replica` stays visible (and keeps refusing vacuums
    * it protects against) instead of being silently dropped and
    * swept.
    */
  def cdcHorizons(dir: String): Map[String, Int] = {
    val root = java.nio.file.Path.of(dir)
    store(dir).list(root)
      .filter(n => n.startsWith("_cdc_horizon-") &&
        !PosixCommitStore.isStagingName(n))
      .flatMap { n =>
      val c = n.stripPrefix("_cdc_horizon-")
      store(dir).read(root.resolve(n)) // None = deregistered mid-list
        .flatMap(b => new String(b, "UTF-8").trim.toIntOption).map(c -> _)
    }.toMap
  }

  /** Registered consumers with their horizon AND last-advanced wall
    * clock (the horizon file's mtime — every registration is an
    * atomic replace, so mtime IS the last advance; no format change,
    * legacy files report their real age). Horizon entries retain
    * storage FOREVER by replication-slot semantics — correctly — so
    * this is the observability an operator needs to spot an
    * ABANDONED slot (lagging horizon, old timestamp) without
    * archaeology; `table cdc-horizons` renders it with a staleness
    * flag, and [[releaseCdcHorizon]] is the decommission.
    */
  def cdcHorizonDetails(dir: String): Map[String, (Int, Long)] =
    cdcHorizons(dir).flatMap { case (c, g) =>
      // None = released mid-read
      store(dir).mtimeMillis(horizonFileOf(dir, c)).map(m => c -> (g, m))
    }

  /** Drop a consumer's registration (decommissioned stream); returns
    * whether it existed.
    */
  def releaseCdcHorizon(dir: String, consumer: String): Boolean =
    store(dir).delete(horizonFileOf(dir, consumer))

  /** Drop everything the COMMITTED manifest no longer references:
    * data files superseded by later rewrites, whole stale generation
    * dirs, and all non-current manifests. Time-travel to old
    * generations ends where vacuum begins (Delta/Iceberg's exact
    * trade); the committed generation is untouched, so readers
    * resolving the marker before/after a vacuum see identical rows.
    * Returns the deleted file count.
    *
    * CONCURRENT-WRITER safety is retention-based, Delta's VACUUM
    * semantics exactly: vacuum resolves "current" once, so a writer
    * committing MID-sweep would look stale to it — `minAgeMs` spares
    * anything modified within the window, which is precisely the
    * in-flight writer's staging and fresh commit. Run with
    * `minAgeMs` comfortably above the longest in-flight commit when
    * writers may be live; 0 (the default) is only safe quiesced.
    *
    * CDC-CONSUMER safety is registration-based: while any
    * [[cdcHorizons]] entry sits BELOW the committed generation, a
    * sweep would delete manifests/files that consumer's replay still
    * needs, so vacuum refuses loudly (naming the consumer) unless
    * `force = true` — catch the stream up, [[releaseCdcHorizon]] it,
    * reclaim AROUND it with [[vacuumRetaining]], or force (after
    * which the stranded stream still fails loudly at its next read,
    * as before).
    */
  def vacuum(s: SparkSession, dir: String, minAgeMs: Long = 0L,
             force: Boolean = false): Int = {
    val gen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val lagging = cdcHorizons(dir).filter(_._2 < gen)
    if (lagging.nonEmpty && !force) {
      val (who, at) = lagging.minBy(_._2)
      throw new IllegalStateException(
        s"vacuum of $dir refused: ${lagging.size} registered CDC consumer(s) " +
          s"still need pre-current generations (e.g. '$who' at generation $at " +
          s"< committed $gen) — catch the stream up, releaseCdcHorizon(), " +
          "vacuumRetaining() to reclaim around them, or pass force = true to " +
          "strand them knowingly")
    }
    vacuumImpl(s, dir, minAgeMs, Set(gen))
  }

  /** Retention-aware vacuum — the replication-slot semantic (Kafka
    * consumer groups hold log segments, Postgres slots hold WAL; a
    * lagging consumer RETAINS, it doesn't block): reclaims everything
    * no registered CDC horizon can still replay, without refusing and
    * without stranding. Keeps the manifests of every generation ≥ the
    * oldest registered horizon (plus current) and every file they
    * reference; sweeps the rest — on a table whose consumers trail by
    * a day, that reclaims all but the day. With no registered
    * horizons this IS [[vacuum]]. The stuck-consumer cost is storage
    * (visible in `table cdc-horizons`), never correctness; time
    * travel below the oldest horizon ends exactly like vacuum's.
    */
  def vacuumRetaining(s: SparkSession, dir: String, minAgeMs: Long = 0L): Int = {
    val gen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val floor = cdcHorizons(dir).values.minOption.getOrElse(gen)
    vacuumImpl(s, dir, minAgeMs, (math.max(0, floor) to gen).toSet + gen)
  }

  private def vacuumImpl(s: SparkSession, dir: String, minAgeMs: Long,
                         protectedGens: Set[Int]): Int = {
    // the CURRENT generation is special: its manifest is the live
    // set's backbone, so a token-less log entry or an unreadable
    // manifest must ABORT the vacuum loudly — a best-effort read here
    // would silently empty `live` and the sweep would delete every
    // live data file. Best-effort applies only to NON-current
    // protected generations that an earlier (forced) vacuum already
    // swept: those protect nothing, and their consumer fails loudly
    // at read, as ever.
    val cur = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val curManifest = s"manifest-g$cur~" + metaAt(dir, cur).getOrElse("token",
      sys.error(s"commit-log entry for generation $cur lacks a token"))
    require(java.nio.file.Files.exists(java.nio.file.Path.of(s"$dir/$curManifest")),
      s"current manifest $curManifest of $dir is missing — refusing to vacuum")
    val keepManifests: Set[String] = (protectedGens - cur).flatMap { g =>
      metaAt(dir, g).get("token").map(t => s"manifest-g$g~$t")
    } + curManifest
    // deletion-vector dirs follow the manifests' lifecycle: keep every
    // segment a kept generation's meta references (a carried reference
    // may name an older generation's dirs, like manifests reference
    // older files-g dirs' files), sweep the superseded rest
    val keepDvs: Set[String] = (protectedGens + cur)
      .flatMap(g => dvSegments(dir, g))
    // governance log: only versions BELOW the current one are sweepable
    val governMax = Seq("_dropped_cols", "_constraints")
      .flatMap(b => governVersions(dir, b).maxOption.map(b -> _)).toMap
    // bloom-sidecar data dirs are published BY REFERENCE from pointer
    // files (like data files from manifests) — an unreferenced
    // `_bloomseg-` dir is a crashed build/fold/clone-copy's orphan, or
    // a replaced segment whose sweep died between pointer-delete and
    // dir-delete; either way dead weight. minAgeMs spares an IN-FLIGHT
    // builder's freshly written dir exactly as it spares in-flight
    // commits (a 0-age vacuum racing a builder is already documented
    // as unsafe-quiesced-only, and even then the loser degrades to an
    // uncovered — sound — index, never a wrong answer).
    val bloomRefs: Set[String] = store(dir).list(bloomPtrDirOf(dir))
      .filter(!_.contains(".tmp-"))
      .flatMap(n => store(dir).read(bloomPtrOf(dir, n)))
      .map(b => new String(b, "UTF-8").trim).toSet
    // ONE batched read over every kept-and-present manifest (a
    // consumer lagging N generations must not cost N driver jobs);
    // schemas differ across generations but every manifest has
    // `path`. A CORRUPT kept manifest aborts the whole vacuum loudly
    // — conservative by design, never a silently-shrunken live set.
    val keptPresent = keepManifests.toSeq.map(n => s"$dir/$n")
      .filter(d => java.nio.file.Files.exists(java.nio.file.Path.of(d)))
    val live: Set[String] = s.read.parquet(keptPresent: _*).select("path")
      .collect()
      .map(r => java.nio.file.Path.of(java.net.URI.create(r.getString(0)))
        .toAbsolutePath.toString).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    // control-plane files may live behind the store rather than on the
    // filesystem: mtimes resolve store-first (the POSIX store reads the
    // filesystem anyway), a missing mtime reads as "too new to sweep",
    // and deletes try both homes
    def oldEnough(p: java.nio.file.Path): Boolean =
      minAgeMs <= 0L ||
        store(dir).mtimeMillis(p)
          .orElse(try Some(java.nio.file.Files.getLastModifiedTime(p).toMillis)
                  catch { case _: java.io.IOException => None })
          .exists(_ < cutoff)
    def del(p: java.nio.file.Path): Boolean = {
      val a = store(dir).delete(p)
      val b = java.nio.file.Files.deleteIfExists(p)
      a || b
    }
    var deleted = 0
    val root = java.nio.file.Path.of(dir)
    val fsNames = PosixCommitStore.list(root)
    // the store may hold control files the filesystem listing can't
    // see (markers under _log/, governance versions, horizons)
    val storeNames = store(dir).list(root)
    val logVirtual =
      if (store(dir).list(logDirOf(dir)).nonEmpty) Seq("_log") else Nil
    // pointer files may live only in the store (in-memory/object
    // impls) — surface the dir to the loop the same way _log is
    val ptrVirtual =
      if (store(dir).list(bloomPtrDirOf(dir)).nonEmpty) Seq("_bloomptr") else Nil
    (fsNames ++ storeNames ++ logVirtual ++ ptrVirtual).distinct.foreach { name =>
      val p = root.resolve(name)
      // `_commit-g<N>` log entries are KEPT — they are the table's
      // history; a vacuumed generation fails loudly in manifestAt
      if (name.startsWith("manifest-g") && !keepManifests.contains(name) &&
          oldEnough(p)) {
        graft.IndexLifecycle.deleteRecursively(p.toString); deleted += 1
      } else if (name.startsWith("dv-g") && !keepDvs.contains(name) &&
          oldEnough(p)) {
        // a superseded deletion-vector dir — its generation's reads end
        // here exactly like a vacuumed manifest (dvFrameAt is loud)
        graft.IndexLifecycle.deleteRecursively(p.toString); deleted += 1
      } else if (name.startsWith("_commit.tmp") && oldEnough(p)) {
        // a crashed commit's staged log entry — never observed by readers
        del(p); deleted += 1
      } else if (((name.startsWith("_constraints") ||
          name.startsWith("_dropped_cols")) && name.contains(".tmp-") ||
          // horizon names embed USER-CHOSEN consumer ids, so only the
          // stores' exact staging-nonce shape is debris here — a
          // `.tmp-`-anywhere match would sweep a live registration
          // like `nightly.tmp-replica` (which cdcHorizons now lists)
          name.startsWith("_cdc_horizon") &&
            PosixCommitStore.isStagingName(name)) &&
          oldEnough(p)) {
        // a crashed constraint/drop-column/horizon staged file —
        // never observed by readers (checkpoint staging lives only
        // under _log/ and is swept by that branch). The `.tmp-`
        // segment may follow the bare base (legacy staging) or a
        // versioned name (the POSIX store stages `<final>.tmp-<n>`).
        del(p); deleted += 1
      } else if (governMax.exists { case (b, mx) =>
          name.startsWith(s"$b-v") &&
            name.stripPrefix(s"$b-v").toIntOption.exists(_ < mx) } &&
          oldEnough(p)) {
        // superseded governance-log version (current one is kept)
        del(p); deleted += 1
      } else if (governMax.contains(name) && oldEnough(p)) {
        // legacy un-versioned governance file superseded by the log
        del(p); deleted += 1
      } else if (name.startsWith("_bloom-g") && name.contains(".tmp") &&
          oldEnough(p)) {
        // a crashed pre-r14 buildBloomIndex's staged sidecar dir
        // (committed legacy sidecars have no .tmp segment and are kept)
        graft.IndexLifecycle.deleteRecursively(p.toString); deleted += 1
      } else if (name.startsWith("_bloomseg-") && !bloomRefs.contains(name) &&
          oldEnough(p)) {
        // an unreferenced sidecar data dir (see bloomRefs above)
        graft.IndexLifecycle.deleteRecursively(p.toString); deleted += 1
      } else if (name == "_bloomptr") {
        // inside the pointer dir only crashed staging (`.tmp-` nonce
        // names from the POSIX store's putReplace) and DANGLING
        // pointers (target dir vacuumed/never landed) are sweepable;
        // live pointers are the index's publication record
        val ptrNames =
          (PosixCommitStore.list(p) ++ store(dir).list(p)).distinct
        ptrNames.foreach { n2 =>
          val e = p.resolve(n2)
          val dangling = !n2.contains(".tmp-") &&
            store(dir).read(e)
              .map(b => new String(b, "UTF-8").trim)
              .forall(t => t.isEmpty || !java.nio.file.Files.exists(
                java.nio.file.Path.of(dir, t)))
          if ((n2.contains(".tmp-") || dangling) && oldEnough(e)) {
            del(e); deleted += 1
          }
        }
      } else if (name == "_log") {
        // commit markers are NEVER swept (the table's lineage); inside
        // the log dir only crashed staging and superseded checkpoint
        // rollups go — the rollup population grows 1 per interval, so
        // vacuum bounds it to the newest two (the newest for readers,
        // one predecessor so a checkpoint writer's prev-rollup probe
        // stays O(interval) right after a vacuum)
        val logNames =
          (PosixCommitStore.list(p) ++ store(dir).list(p)).distinct
        val ckptGens = logNames
          .filter(_.matches("_checkpoint-g\\d+"))
          .map(_.stripPrefix("_checkpoint-g").toInt).sorted
        // newest two, plus whatever the pointer names (a pointer left
        // behind by failed advances must not lose its target to the
        // sweep — that would downgrade resolution to the listing path)
        val keepCkpts = ckptGens.takeRight(2).toSet ++ lastCheckpointGen(dir)
        logNames.foreach { n2 =>
          val e = p.resolve(n2)
          val sweep =
            // any `.tmp-` name is crashed staging (legacy `_commit.tmp-<t>`
            // or the POSIX store's `<final>.tmp-<n>` discipline)
            (n2.contains(".tmp-") ||
             (n2.matches("_checkpoint-g\\d+") &&
              !keepCkpts.contains(n2.stripPrefix("_checkpoint-g").toInt))) &&
            oldEnough(e)
          if (sweep) { del(e); deleted += 1 }
        }
      } else if (name.startsWith("files-g")) {
        val fs = java.nio.file.Files.list(p)
        val files = try fs.iterator().asScala.toSeq finally fs.close()
        files.foreach { f =>
          if (!live.contains(f.toAbsolutePath.toString) && oldEnough(f)) {
            java.nio.file.Files.deleteIfExists(f); deleted += 1
          }
        }
        // a generation dir emptied of data files can go entirely
        val rest = java.nio.file.Files.list(p)
        val empty = try !rest.iterator().hasNext finally rest.close()
        if (empty) java.nio.file.Files.deleteIfExists(p)
      }
    }
    deleted
  }

  // ---- restore & shallow clone ----

  /** RESTORE: roll the table BACK to generation `toGen` by committing
    * a NEW generation whose manifest is `toGen`'s manifest verbatim
    * (Delta's RESTORE semantics — history only moves forward, the
    * rollback is itself a commit, racing writers lose via the same
    * OCC link). Nothing is copied: the new manifest re-references the
    * old files, which also re-protects them from [[vacuum]] (whose
    * live set is the current manifest). Requires `toGen`'s manifest
    * AND every file it references to still exist — a vacuumed restore
    * point fails loudly, listing what's missing. The restore lands in
    * the CDC feed like any commit: [[changesBetween]](cur, restored)
    * is the net inverse of everything since `toGen`, so replicas and
    * indexes tailing the feed revert without special-casing. Returns
    * the new generation number.
    *
    * Bloom sidecars DECAY across a restore (sound, not maintained):
    * the re-referenced old files' sketch rows were dropped by
    * maintenance folds when those files died, so they re-enter as
    * UNCOVERED (admitted on every probe) — re-sketching them would
    * cost a read of the restored data, which a metadata-only rollback
    * must not pay. Rebuild with [[buildBloomIndex]] if the rolled-back
    * table stays hot under point lookups.
    */
  def restore(s: SparkSession, dir: String, toGen: Int): Int = {
    val cur = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val man = manifestAt(s, dir, toGen) // loud when the manifest was vacuumed
    val missing = man.select("path").collect().map(_.getString(0))
      .filterNot(p => java.nio.file.Files.exists(
        java.nio.file.Path.of(java.net.URI.create(p))))
    require(missing.isEmpty,
      s"cannot restore $dir to generation $toGen: ${missing.length} referenced " +
        s"file(s) no longer exist (vacuumed), e.g. ${missing.take(3).mkString(", ")}")
    // a restore point's deletion vector is part of its visible state:
    // re-reference every segment (loud when vacuumed, like the manifest)
    dvSegments(dir, toGen).foreach(n => require(
      java.nio.file.Files.exists(java.nio.file.Path.of(s"$dir/$n")),
      s"cannot restore $dir to generation $toGen: its deletion-vector " +
        s"segment $n was vacuumed"))
    val next = cur + 1
    val token = newToken()
    man.coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    val schemaJson = schemaAt(dir, toGen).map(_.json)
      .orElse(schemaAt(dir, cur).map(_.json))
    commitGen(dir, next, token, schemaJson.map("schema" -> _).toMap +
      ("op" -> "restore") + ("restore_of" -> toGen.toString) ++
      inheritDvMeta(dir, toGen))
    next
  }

  /** SHALLOW CLONE: materialize `dstDir` as a NEW keyed table whose
    * generation-0 manifest references `srcDir`'s current files — zero
    * data copied (Delta's SHALLOW CLONE). Writes against the clone
    * land in ITS OWN `files-g*` dirs while untouched files stay
    * shared by reference, so a 100 TB table forks for an experiment
    * or a backfill rehearsal at manifest cost. The clone's [[vacuum]]
    * sweeps only `files-g*` under `dstDir` and can never delete
    * shared source files; the SOURCE's vacuum, though, doesn't know
    * about clones — vacuuming the source once the clone has diverged
    * can drop files the clone still references (the documented
    * shallow-clone trade; [[restore]]'s existence check and the
    * parquet reader both fail loudly rather than return partial
    * rows). Returns the source generation the clone was cut from.
    */
  def cloneTable(s: SparkSession, srcDir: String, dstDir: String): Int = {
    val g = committedGen(srcDir).getOrElse(
      sys.error(s"$srcDir is not a committed keyed table (no commit log)"))
    require(committedGen(dstDir).isEmpty,
      s"clone target $dstDir is already a committed table")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(dstDir))
    val token = newToken()
    manifestAt(s, srcDir, g).coalesce(1)
      .write.parquet(manifestDirOf(dstDir, 0, token))
    val meta = schemaAt(srcDir, g).map(sch => "schema" -> sch.json).toMap +
      ("op" -> "clone") + ("cloned_from" -> s"$srcDir@g$g")
    // governance state rides the clone: the clone shares the source's
    // carried files, so a retired column name (bytes still buried in
    // shared files) must stay guarded on the clone too, and Delta's
    // CLONE copies table constraints — both are tiny atomic files
    writeDroppedCols(dstDir, droppedColumns(srcDir))
    writeConstraintsFile(dstDir, checkConstraints(srcDir))
    // bloom sidecars ride too: their rows are keyed by ABSOLUTE file
    // path and the clone's gen-0 manifest references exactly the
    // source's files, so the newest segment per column (per k-family —
    // a surviving different-numHashes segment's coverage rides along)
    // is valid for the clone verbatim — copied (sidecar-sized, not
    // data-sized) into a clone-side tokened dir and pointer-published
    // under the clone's generation-0 name, so its probes prune from
    // the first read instead of starting uncovered (and a crash
    // mid-copy leaves an unpublished orphan, never a torn segment)
    bloomDirs(srcDir).groupBy(t => (t.col, t.k)).values
      .map(_.maxBy(_.gen)).foreach { seg =>
        // keep the name's k/numBits segment verbatim (legacy names too)
        val dstName = seg.name.replaceFirst("^_bloom-g\\d+", "_bloom-g0")
        val dataName = s"_bloomseg-${newToken()}"
        try {
          org.apache.commons.io.FileUtils.copyDirectory(
            new java.io.File(seg.dataDir), new java.io.File(s"$dstDir/$dataName"))
          publishBloomSeg(dstDir, dstName, dataName)
        } catch { case e: java.io.IOException => System.err.println(
          s"[graft] clone of bloom sidecar ${seg.name} failed (clone starts " +
            s"uncovered, sound; rebuild with buildBloomIndex): $e")
        }
      }
    // the deletion vector is part of the cloned visible state: COPIED
    // (vector-sized), not referenced — the source's vacuum after
    // divergence must not be able to blind the clone's reads. Entries
    // name the SOURCE's file paths, which is exactly what the clone's
    // gen-0 manifest references. Segments collapse into ONE clone-side
    // dir (a clone is a natural rollup point, same as a pruning
    // rewrite).
    val dvCloneMeta: Map[String, String] = dvSegments(srcDir, g) match {
      case Nil => Map.empty
      case segs =>
        val dst = dvNameOf(0, token)
        s.read.parquet(segs.map(n => s"$srcDir/$n"): _*)
          .coalesce(4).write.parquet(s"$dstDir/$dst")
        Map("dv" -> dst) ++ metaAt(srcDir, g).get("dv_rows").map("dv_rows" -> _)
    }
    commitGen(dstDir, 0, token, meta ++ dvCloneMeta)
    g
  }

  /** The commit history (Delta's DESCRIBE HISTORY): one row per
    * committed generation, newest first — (gen, op, ts, detail),
    * where `op` is the writer's tag (write/cluster/merge/compact/
    * delete/update/restore/clone; null for pre-tag commits), `ts`
    * the commit's wall-clock stamp, and `detail` every other
    * commit-log line except the bulky schema JSON (so restore_of /
    * cloned_from / a sink's batchId read straight off the row).
    * Driver-sized by construction: one head resolution plus one tiny
    * log-entry read per generation (O(generations) deliberately —
    * this IS the full-lineage read), no Spark job over data.
    * History survives vacuum — the log entries are the table's
    * lineage and are never swept, only manifests/files are.
    */
  def history(s: SparkSession, dir: String): DataFrame = {
    val cur = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    import s.implicits._
    (cur to 0 by -1).map { g =>
      val m = metaAt(dir, g)
      (g, m.get("op").orNull, m.get("ts").map(_.toLong).getOrElse(0L),
        m.removedAll(Seq("op", "ts", "schema", "token")))
    }.toDF("gen", "op", "ts", "detail")
  }

  // ---- the merge ----

  /** Apply a CDC change batch to the table at `dir`. `changes` caries
    * the key column, an `op` column (`U` update-if-matched overlay /
    * `D` delete-if-matched / `I` unconditional insert), and the
    * table's value columns (null value columns on a `U` leave the
    * target's value in place — q56's coalesce overlay, per column).
    *
    * Phases:
    *  1. PRUNE — only U/D rows must find resident keys; the
    *     file-count-sized manifest broadcasts against the change
    *     batch and every file whose [min_k, max_k] contains a U/D
    *     key is `touched`. The collected result is ≤ file-count
    *     paths (driver-sized by definition, like a probed-cell list).
    *  2. REWRITE — q56's plan over ONLY the touched files: left
    *     overlay join with U, anti join with D, union I; range-write
    *     into `files-g<next>` (inserts land key-sorted beside the
    *     rewritten rows).
    *  3. COMMIT — new manifest = untouched entries carried by
    *     reference + stats of the new files; the commit-log link
    *     lands last. A crashed predecessor's staging is invisible
    *     (token-suffixed, never referenced by a log entry) and
    *     vacuumable; a CONCURRENT writer that committed this
    *     generation first surfaces as
    *     `ConcurrentModificationException` after this writer's own
    *     staging is cleaned up — recompute on the new base and retry.
    */
  def merge(s: SparkSession, dir: String, changes: DataFrame,
            keyCol: String, meta: Map[String, String] = Map.empty): MergeStats = {
    val prevGen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val next = prevGen + 1
    val token = newToken()

    val man = manifestAt(s, dir, prevGen)
    // manifest path under a reserved alias — a table legitimately
    // keyed by a column NAMED 'path' must not make the post-join
    // projection ambiguous
    val ranges = man.select(col("path").as("__mf_path"),
      col(s"min_$keyCol").as("__mn"), col(s"max_$keyCol").as("__mx"))
    // null-admits, like every other stats consumer: a null bound (a
    // pre-evolution carry, or a truncated string stat whose prefix
    // had no ASCII char to increment) proves nothing, so the file is
    // TOUCHED for any U/D key — dropping it would silently discard
    // the change
    val touched = changes.filter(col("op").isin("U", "D"))
      .join(broadcast(ranges),
        (col("__mn").isNull || col(keyCol) >= col("__mn")) &&
          (col("__mx").isNull || col(keyCol) <= col("__mx")))
      .select("__mf_path").distinct().collect().map(_.getString(0)).toIndexedSeq
    val untouched = man.select("path").collect().map(_.getString(0))
      .filterNot(touched.contains).toIndexedSeq

    // Schema evolution: valueCols is the UNION of the table's existing
    // value columns and the batch's. A batch may introduce NEW columns
    // (rewritten/insert files carry them; carried files surface them
    // as null through the mergeSchema reads) and may OMIT existing
    // ones (preserved untouched through the overlay) — Delta's
    // mergeSchema semantics on this layer.
    val changeVals = changes.columns.filterNot(c => c == keyCol || c == "op").toSeq
    val changeType = changes.schema.fields.map(f => f.name -> f.dataType).toMap
    // table schema from the commit log (no footer pass); fallback =
    // mergeSchema over the LIVE file set — a single-file sample could
    // predate an earlier evolution and silently drop its columns
    val livePaths = (touched ++ untouched).toIndexedSeq
    val tableVals: Seq[(String, org.apache.spark.sql.types.DataType)] =
      schemaAt(dir, prevGen) match {
        case Some(sch) => sch.fields.toSeq.filterNot(_.name == keyCol)
          .map(f => f.name -> f.dataType)
        case None if livePaths.isEmpty => Seq.empty
        case None => s.read.option("mergeSchema", "true").parquet(livePaths: _*)
          .schema.fields.toSeq.filterNot(_.name == keyCol)
          .map(f => f.name -> f.dataType)
      }
    val tableType = tableVals.toMap
    val valueCols = tableVals.map(_._1) ++
      changeVals.filterNot(tableVals.map(_._1).contains)
    // retired-name guard (see dropColumn): a batch re-introducing a
    // dropped column name would resurrect bytes still buried in
    // carried files (parquet resolves by name) — allowed only once no
    // live file physically carries it, checked with one footer pass
    // paid only on this rare collision. Comparison is CASE-INSENSITIVE
    // like Spark's own field resolution: a batch's 'NOTE' would clip
    // onto a buried physical 'note' exactly the same way
    val retiredLower = droppedColumns(dir).map(_.toLowerCase)
    val reintroduced = changeVals.filterNot(tableVals.map(_._1).contains)
      .filter(c => retiredLower.contains(c.toLowerCase))
    if (reintroduced.nonEmpty) {
      val physical =
        if (livePaths.isEmpty) Set.empty[String]
        else s.read.option("mergeSchema", "true").parquet(livePaths: _*)
          .schema.fieldNames.map(_.toLowerCase).toSet
      val blocked = reintroduced.filter(c => physical.contains(c.toLowerCase))
      if (blocked.nonEmpty) throw new IllegalStateException(
        s"merge on $dir re-introduces dropped column(s) ${blocked.mkString(", ")} " +
          "still physically present in live files — rewrite the table first " +
          "(compact everything) or use a fresh column name")
    }
    val ins = changes.filter(col("op") === "I")
      .select(col(keyCol) +: valueCols.map { c =>
        if (changeVals.contains(c)) col(c)
        else lit(null).cast(tableType(c)).as(c) }: _*)
    val rewritten: Option[DataFrame] = if (touched.nonEmpty) {
      // vector-filtered: a rewritten file's replacement bytes must not
      // resurrect rows a deletion-vector commit already hid
      val t = readVisible(s, dir, prevGen, touched)
      val overlay = changes.filter(col("op") === "U")
        .select(col(keyCol) +: changeVals.map(c => col(c).as(s"__u_$c")): _*)
      val del = changes.filter(col("op") === "D").select(col(keyCol))
      Some(t.join(overlay, Seq(keyCol), "left_outer")
        .join(del, Seq(keyCol), "left_anti")
        .select(col(keyCol) +: valueCols.map { c =>
          val tcol = if (t.columns.contains(c)) col(c)
                     else lit(null).cast(tableType.getOrElse(c, changeType(c)))
          (if (changeVals.contains(c)) coalesce(col(s"__u_$c"), tcol)
           else tcol).as(c)
        }: _*))
    } else None
    val newRows = (rewritten.toSeq :+ ins).reduce(_ unionByName _)
    val staging = dataDirOf(dir, next, token)
    newRows.repartitionByRange(math.max(1, touched.size), col(keyCol))
      .write.parquet(staging)
    enforceConstraintsStaged(s, dir, staging, Seq(staging), "merge")

    val newStats =
      if (hasParquetFiles(staging)) statsOf(s, staging, keyCol)
      else man.filter(lit(false)) // everything deleted, nothing inserted
    // allowMissingColumns: a schema evolution adds stat columns the
    // carried entries don't have — they union as null, and every
    // stats consumer treats null as "can't prune, include"
    man.filter(col("path").isin(untouched: _*))
      .unionByName(newStats, allowMissingColumns = true)
      .coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    // the union schema rides the commit-log entry (schema-in-log);
    // the deletion vector carries minus the rewritten files' entries
    val dvMeta = dvMetaForCommit(s, dir, prevGen, next, token, touched)
    try commitGen(dir, next, token,
      Map("op" -> "merge") ++ meta ++ dvMeta + ("schema" -> newRows.schema.json))
    catch {
      case e: java.util.ConcurrentModificationException =>
        Seq(staging, manifestDirOf(dir, next, token), s"$dir/${dvNameOf(next, token)}")
          .foreach(graft.IndexLifecycle.deleteRecursively)
        throw e
    }
    // un-retire only AFTER the commit landed: an aborted merge
    // (constraint rejection, lost OCC race) must not strip the guard —
    // a later restore could resurface physical carriers the footer
    // check above no longer sees. Fresh read-modify-write (not a
    // pre-computed snapshot) so a concurrent drop of a DIFFERENT
    // column isn't clobbered.
    if (reintroduced.nonEmpty) {
      // un-retire only names STILL IN THE COMMITTED SCHEMA, the check
      // re-read inside the CAS transform (fresh on every lost-race
      // retry): a concurrent dropColumn of the same name that already
      // committed must keep its retirement — and for the ms-window
      // where that drop has retired but not yet committed, dropColumn
      // re-asserts its retirement post-commit, so no interleaving
      // leaves a committed drop unguarded.
      val gone = reintroduced.map(_.toLowerCase).toSet
      updateDroppedCols(dir) { cur =>
        val sch = committedGen(dir).flatMap(g => schemaAt(dir, g))
        cur.filterNot { n =>
          gone.contains(n.toLowerCase) &&
            sch.exists(_.fieldNames.exists(_.equalsIgnoreCase(n)))
        }
      }
    }
    maintainBloomSidecars(s, dir, next, staging)
    MergeStats(next, touched, untouched)
  }

  // ---- compaction ----

  /** Bin-pack small files into a new generation: every live file
    * under `targetRows` is rewritten, range-packed into
    * ⌈Σrows / targetRows⌉ files; every file already at size is
    * carried by reference, bytes untouched. A no-op (< 2 small
    * files) commits nothing — the generation only advances when
    * there is something to gain. This is the maintenance half of the
    * merge loop at 100 TB: repeated banded merges and insert batches
    * strew band-sized files across generations, and compaction folds
    * them back toward the write-time layout in time ∝ the SMALL
    * files, never the table.
    */
  def compact(s: SparkSession, dir: String, keyCol: String,
              targetRows: Long): MergeStats = {
    val prevGen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val man = manifestAt(s, dir, prevGen)
    val small = man.filter(col("n_rows") < targetRows)
      .select("path", "n_rows").collect()
    val all = man.select("path").collect().map(_.getString(0)).toIndexedSeq
    if (small.length < 2)
      return MergeStats(prevGen, Nil, all) // nothing to fold together
    val next = prevGen + 1
    val token = newToken()
    val touched = small.map(_.getString(0)).toIndexedSeq
    val untouched = all.filterNot(touched.contains)
    val outFiles = math.max(1,
      math.ceil(small.map(_.getLong(1)).sum.toDouble / targetRows).toInt)
    val staging = dataDirOf(dir, next, token)
    // log-schema read: the fold set may span an evolution; the
    // compacted files must carry the union schema. Vector-filtered:
    // compaction is also the deletion-vector MATERIALIZATION pass —
    // folded files shed their hidden rows physically
    readVisible(s, dir, prevGen, touched)
      .repartitionByRange(outFiles, col(keyCol))
      .write.parquet(staging)
    man.filter(col("path").isin(untouched: _*))
      .unionByName(statsOf(s, staging, keyCol), allowMissingColumns = true)
      .coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    val dvMeta = dvMetaForCommit(s, dir, prevGen, next, token, touched)
    try commitGen(dir, next, token, Map("op" -> "compact") ++ dvMeta ++
      schemaAt(dir, prevGen).map(sch => Map("schema" -> sch.json)).getOrElse(Map.empty))
    catch {
      case e: java.util.ConcurrentModificationException =>
        Seq(staging, manifestDirOf(dir, next, token), s"$dir/${dvNameOf(next, token)}")
          .foreach(graft.IndexLifecycle.deleteRecursively)
        throw e
    }
    maintainBloomSidecars(s, dir, next, staging)
    MergeStats(next, touched, untouched)
  }

  // ---- predicate DML: DELETE WHERE / UPDATE WHERE ----

  /** One predicate-DML commit's file triage. `dropped` files left the
    * manifest WITHOUT being read (metadata-only); `rewritten` were
    * read and rewritten minus/with the change; `carried` moved to the
    * new manifest by reference, bytes untouched.
    */
  final case class DmlStats(gen: Int, dropped: Seq[String],
                            rewritten: Seq[String], carried: Seq[String])

  /** The band [lo, hi] on `colName` as a row predicate; an absent
    * bound is unbounded on that side (retention deletes are one-sided:
    * `ts < cutoff` ≡ hi = Some(cutoff), lo = None).
    */
  private def bandPredicate(colName: String, lo: Option[Any], hi: Option[Any]): Column = {
    val conds = lo.map(l => col(colName) >= lit(l)).toSeq ++
      hi.map(h => col(colName) <= lit(h)).toSeq
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Manifest-level triage of the committed files against the band:
    * (provably-disjoint → carry, provably-all-match → drop-eligible,
    * rest → rewrite). Soundness mirrors every other stats consumer:
    * null/missing stats prove nothing and land in `rewrite`; the
    * all-match proof additionally requires `nn_c == n_rows` (min/max
    * ignore nulls — a null-valued row's predicate is UNKNOWN, so SQL
    * DML must leave it alone, so a file holding one is never dropped
    * whole).
    */
  private def triage(man: DataFrame, colName: String,
                     lo: Option[Any], hi: Option[Any]): (Seq[String], Seq[String], Seq[String]) = {
    val (minC, maxC, nnC) = (s"min_$colName", s"max_$colName", s"nn_$colName")
    if (!man.columns.contains(minC)) { // unstatted column: no pruning at all
      val all = man.select("path").collect().map(_.getString(0)).toIndexedSeq
      return (Seq.empty, Seq.empty, all)
    }
    val disjoint = coalesce(
      lo.map(l => col(maxC) < lit(l)).getOrElse(lit(false)) ||
        hi.map(h => col(minC) > lit(h)).getOrElse(lit(false)),
      lit(false))
    val allMatch = coalesce(
      col(minC).isNotNull && col(maxC).isNotNull &&
        (if (man.columns.contains(nnC)) col(nnC) === col("n_rows") else lit(false)) &&
        lo.map(l => col(minC) >= lit(l)).getOrElse(lit(true)) &&
        hi.map(h => col(maxC) <= lit(h)).getOrElse(lit(true)),
      lit(false))
    val triaged = man.select(col("path"),
      when(disjoint, "carry").when(allMatch, "drop").otherwise("rewrite").as("cls"))
      .collect()
    def of(cls: String) = triaged.filter(_.getString(1) == cls)
      .map(_.getString(0)).toIndexedSeq
    (of("drop"), of("rewrite"), of("carry"))
  }

  /** `DELETE FROM table WHERE colName BETWEEN lo AND hi` (either bound
    * optional) — the predicate-driven half of the DML surface;
    * [[merge]] is the keyed-batch half. Three file classes from the
    * manifest stats, and the interesting one is the first: a file the
    * stats PROVE fully inside the band (all rows non-null and in
    * range) leaves the manifest without being opened — zero data IO.
    * A retention delete aligned with the write clustering (drop
    * everything before a cutoff on the key of a range-written table)
    * is therefore METADATA-ONLY except at the boundary file: at
    * 100 TB that is a directory-listing-sized commit, not a scan.
    * Boundary files rewrite with `NOT coalesce(band, false)` — a
    * null-valued row's predicate is UNKNOWN, so it survives, exactly
    * ANSI DELETE. Everything else carries by reference.
    *
    * CDC falls out for free: dropped and rewritten files differ
    * between the two manifests, so [[changesBetween]] reports the
    * deleted rows as `D` without any DML-side bookkeeping. A no-op
    * delete (band provably disjoint from every file) does NOT advance
    * the generation, like [[compact]].
    */
  def deleteWhere(s: SparkSession, dir: String, keyCol: String, colName: String,
                  lo: Option[Any], hi: Option[Any]): DmlStats = {
    val prevGen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val man = manifestAt(s, dir, prevGen)
    val (dropped, rewrite, carried) = triage(man, colName, lo, hi)
    if (dropped.isEmpty && rewrite.isEmpty)
      return DmlStats(prevGen, Nil, Nil, carried) // provably no row matches
    val next = prevGen + 1
    val token = newToken()
    val staging = dataDirOf(dir, next, token)
    if (rewrite.nonEmpty) {
      // vector-filtered: the boundary rewrite must not resurrect rows
      // a deletion-vector commit already hid
      val survivors = readVisible(s, dir, prevGen, rewrite)
        .filter(!coalesce(bandPredicate(colName, lo, hi), lit(false)))
      survivors.repartitionByRange(math.max(1, rewrite.size), col(keyCol))
        .write.parquet(staging)
    }
    val newStats =
      if (hasParquetFiles(staging)) statsOf(s, staging, keyCol)
      else man.filter(lit(false))
    man.filter(col("path").isin(carried: _*))
      .unionByName(newStats, allowMissingColumns = true)
      .coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    // the all-match metadata drop stays sound under a vector: every
    // PHYSICAL row matching implies every VISIBLE row matches, and the
    // dropped file takes its vector entries with it
    val dvMeta = dvMetaForCommit(s, dir, prevGen, next, token, dropped ++ rewrite)
    try commitGen(dir, next, token, Map("op" -> "delete") ++ dvMeta ++
      schemaAt(dir, prevGen).map(sch => Map("schema" -> sch.json)).getOrElse(Map.empty))
    catch {
      case e: java.util.ConcurrentModificationException =>
        Seq(staging, manifestDirOf(dir, next, token), s"$dir/${dvNameOf(next, token)}")
          .foreach(graft.IndexLifecycle.deleteRecursively)
        throw e
    }
    maintainBloomSidecars(s, dir, next, staging)
    DmlStats(next, dropped, rewrite, carried)
  }

  /** `UPDATE table SET c = expr, … WHERE colName BETWEEN lo AND hi` —
    * each `set` value is a Column over the row (so `bal -> col("bal")
    * * 1.1` works). Files the stats prove disjoint from the band carry
    * by reference; everything else rewrites with
    * `when(band, expr).otherwise(old)` per set column — a null-valued
    * row's band is UNKNOWN and `when` falls to `otherwise`, exactly
    * ANSI UPDATE. No metadata-only class exists here (an updated row
    * must be written somewhere), so the win is the carry: a banded
    * update against a range-clustered table rewrites the band, not
    * the table. Set columns must already exist ([[merge]] is the
    * schema-evolution path). No-op (all files disjoint) does not
    * advance the generation; CDC reports the `U` rows from the file
    * diff for free.
    */
  def updateWhere(s: SparkSession, dir: String, keyCol: String, colName: String,
                  lo: Option[Any], hi: Option[Any],
                  set: Map[String, Column]): DmlStats = {
    val prevGen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val tableCols = schemaAt(dir, prevGen).map(_.fieldNames.toSeq).getOrElse(
      readTable(s, dir).columns.toSeq)
    val unknown = set.keySet.diff(tableCols.toSet)
    require(unknown.isEmpty,
      s"updateWhere set columns not in the table: ${unknown.mkString(", ")} " +
        "(schema evolution goes through merge)")
    require(!set.contains(keyCol),
      s"updateWhere cannot reassign the table key '$keyCol' — " +
        "model a key change as merge(D old, I new)")
    val man = manifestAt(s, dir, prevGen)
    val (inBand, rewrite0, carried) = triage(man, colName, lo, hi)
    val rewrite = (inBand ++ rewrite0).toIndexedSeq // all-match still rewrites
    if (rewrite.isEmpty)
      return DmlStats(prevGen, Nil, Nil, carried)
    val next = prevGen + 1
    val token = newToken()
    val staging = dataDirOf(dir, next, token)
    val band = bandPredicate(colName, lo, hi)
    val t = readVisible(s, dir, prevGen, rewrite)
    // cast each set expression to the column's existing type: the
    // rewritten files must stay physically readable under the
    // UNCHANGED log schema the commit carries forward
    val updated = t.select(t.columns.toIndexedSeq.map { c =>
      set.get(c).map(v =>
        when(band, v.cast(t.schema(c).dataType)).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*)
    updated.repartitionByRange(math.max(1, rewrite.size), col(keyCol))
      .write.parquet(staging)
    enforceConstraintsStaged(s, dir, staging, Seq(staging), "updateWhere")
    man.filter(col("path").isin(carried: _*))
      .unionByName(statsOf(s, staging, keyCol), allowMissingColumns = true)
      .coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    val dvMeta = dvMetaForCommit(s, dir, prevGen, next, token, rewrite)
    try commitGen(dir, next, token, Map("op" -> "update") ++ dvMeta ++
      schemaAt(dir, prevGen).map(sch => Map("schema" -> sch.json)).getOrElse(Map.empty))
    catch {
      case e: java.util.ConcurrentModificationException =>
        Seq(staging, manifestDirOf(dir, next, token), s"$dir/${dvNameOf(next, token)}")
          .foreach(graft.IndexLifecycle.deleteRecursively)
        throw e
    }
    maintainBloomSidecars(s, dir, next, staging)
    DmlStats(next, Nil, rewrite, carried)
  }

  // ---- governance files: versioned link(2)-CAS ----
  //
  // _dropped_cols and _constraints are tiny read-modify-write state
  // shared by concurrent writers (a merge un-retiring one name can
  // race a dropColumn retiring another; two operators can race
  // constraint edits). An atomic-replace file makes each WRITE atomic
  // but not the read-modify-write, so the loser of a race could
  // silently erase the winner's update — for _dropped_cols that means
  // a disabled byte-resurrection guard. They therefore get the commit
  // log's exact discipline: state lives in versioned files
  // `<base>-v<N>`, a writer reads the highest version, computes the
  // new content, and publishes by hard-linking to v<N+1> — link(2)
  // never replaces an existing name, so of two racing writers exactly
  // ONE wins and the loser retries its TRANSFORM on the fresh state; a
  // lost update is impossible. Old versions are left for [[vacuum]]
  // (a reader may still be mid-read); a legacy un-versioned `<base>`
  // file reads as version 0 and is superseded by the first CAS write.

  private def governFileOf(dir: String, base: String, v: Int) =
    java.nio.file.Path.of(dir, s"$base-v$v")

  private def governVersions(dir: String, base: String): Seq[Int] = {
    val prefix = s"$base-v"
    store(dir).list(java.nio.file.Path.of(dir)).flatMap(n =>
      if (n.startsWith(prefix)) n.stripPrefix(prefix).toIntOption else None)
  }

  /** (version, content) — highest version wins; retried when a
    * just-vacuumed version vanishes under the read.
    */
  private def governRead(dir: String, base: String): (Int, String) = {
    while (true) {
      val vs = governVersions(dir, base)
      if (vs.isEmpty) {
        val legacy = java.nio.file.Path.of(dir, base)
        return (0, store(dir).read(legacy).map(new String(_, "UTF-8")).getOrElse(""))
      }
      store(dir).read(governFileOf(dir, base, vs.max)) match {
        case Some(b) => return (vs.max, new String(b, "UTF-8"))
        case None    => () // swept under the read: retry
      }
    }
    sys.error("unreachable")
  }

  /** CAS-advance: apply `f` to the current content and publish via
    * the store's put-if-absent on the next version name, retrying on
    * a lost race with a FRESH read (so `f` always transforms the
    * winner's state, never a stale snapshot). Returns the published
    * content.
    */
  private def governCas(dir: String, base: String)(f: String => String): String = {
    while (true) {
      val (v, cur) = governRead(dir, base)
      val next = f(cur)
      // no-op: nothing to publish (at v0 only when there is also no
      // legacy content worth superseding — e.g. cloning an
      // ungoverned table must not scatter empty version files)
      if (next == cur && (v > 0 || next.isEmpty)) return next
      if (store(dir).putIfAbsent(governFileOf(dir, base, v + 1),
          next.getBytes("UTF-8")))
        return next
      // lost the version CAS: retry f on the winner's state
    }
    sys.error("unreachable")
  }

  // ---- DROP COLUMN (metadata-only) ----

  private def renderNames(names: Set[String]): String =
    if (names.isEmpty) "" else names.toSeq.sorted.mkString("", "\n", "\n")
  private def parseNames(content: String): Set[String] =
    content.linesIterator.filter(_.nonEmpty).toSet

  /** Column names retired by [[dropColumn]] and not yet physically
    * shed from the live files.
    */
  def droppedColumns(dir: String): Set[String] =
    parseNames(governRead(dir, "_dropped_cols")._2)

  /** Race-proof retire/un-retire (see the CAS block above). */
  private[operators] def updateDroppedCols(dir: String)(f: Set[String] => Set[String]): Unit = {
    governCas(dir, "_dropped_cols")(c => renderNames(f(parseNames(c)))); ()
  }

  private def writeDroppedCols(dir: String, names: Set[String]): Unit =
    updateDroppedCols(dir)(_ => names)

  /** DROP COLUMN as a METADATA-ONLY commit (Delta's drop-column-with-
    * column-mapping semantics at this layer): a new generation
    * re-referencing the SAME files under a log schema that no longer
    * carries the column — zero data IO on a 100 TB table; every
    * reader projects through the explicit log schema, so the buried
    * bytes are invisible immediately and vacuum never needs to know.
    * The name is RETIRED (`_dropped_cols`, atomic-replace like
    * `_constraints`): parquet resolves columns by NAME, so a same-name
    * re-add through merge's schema evolution would resurrect the old
    * bytes still buried in carried files — [[merge]] therefore refuses
    * a retired name unless no live file still physically carries it
    * (one mergeSchema footer pass, paid only on that rare collision;
    * after a full rewrite the name un-retires automatically). RENAME
    * is deliberately drop+add-as-new: without per-column ids a rename
    * that preserves values is a full rewrite — do that explicitly.
    * Constraints referencing the column must be dropped first (their
    * enforcement would fail analysis on every later mutation).
    * Time travel to pre-drop generations still sees the column;
    * [[restore]] to one resurrects it (the schema rides the log).
    */
  def dropColumn(s: SparkSession, dir: String, keyCol: String,
                 colName: String): Int = {
    require(colName != keyCol,
      s"cannot drop the table key '$keyCol'")
    val prevGen = committedGen(dir).getOrElse(
      sys.error(s"$dir is not a committed keyed table (no commit log)"))
    val sch = schemaAt(dir, prevGen).getOrElse(
      sys.error(s"$dir generation $prevGen records no schema in its commit log"))
    require(sch.fieldNames.contains(colName),
      s"no column '$colName' in ${sch.fieldNames.mkString("[", ",", "]")}")
    checkConstraints(dir).foreach { case (n, e) =>
      // case-insensitive like Spark's resolution, last name part for
      // qualified refs — a 'BAL > 0' constraint must block dropping
      // 'bal', else every later mutation's enforcement fails analysis
      val refs = s.sessionState.sqlParser.parseExpression(e).collect {
        case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          ua.nameParts.last.toLowerCase
      }
      require(!refs.contains(colName.toLowerCase),
        s"CHECK constraint '$n' ($e) references '$colName' — drop it first")
    }
    val next = prevGen + 1
    val token = newToken()
    // same files, re-manifested verbatim; only the log schema changes
    manifestAt(s, dir, prevGen)
      .coalesce(1).write.parquet(manifestDirOf(dir, next, token))
    val newSch = org.apache.spark.sql.types.StructType(
      sch.fields.filterNot(_.name == colName))
    // retire BEFORE the commit link: a crash between the two leaves a
    // retired-but-live column, which the merge guard ignores (the name
    // is still in the table schema, so nothing "re-introduces" it) —
    // the reverse order would leave a committed drop UNguarded. Both
    // the retire and the rollback are link(2)-CAS TRANSFORMS touching
    // only this column, so a concurrent winner's retirement of a
    // DIFFERENT column can never be clobbered by this writer's
    // rollback (a lost update is structurally impossible now — the
    // loser of the CAS race re-applies its single-name change to the
    // winner's state).
    updateDroppedCols(dir)(_ + colName)
    try commitGen(dir, next, token, Map("op" -> "dropcol",
      "dropped" -> colName, "schema" -> newSch.json) ++
      inheritDvMeta(dir, prevGen))
    catch {
      case e: java.util.ConcurrentModificationException =>
        rollbackRetirement(dir, colName)
        graft.IndexLifecycle.deleteRecursively(manifestDirOf(dir, next, token))
        throw e
    }
    // re-assert the retirement after the commit landed: a concurrent
    // merge's un-retire (or a racing loser's rollback) may have read
    // a PRE-commit schema and stripped it inside the narrow window
    // between this writer's retire and its commit link; the add is an
    // idempotent CAS, and once the post-drop schema is committed the
    // schema-checked strips can no longer fire — so every
    // interleaving leaves this committed drop guarded.
    updateDroppedCols(dir)(_ + colName)
    // a sidecar on the dropped column would keep sketching invisible
    // bytes; sweep it (probes on the column now fail analysis anyway)
    bloomDirsFor(dir, colName).foreach(seg => dropBloomSeg(dir, seg))
    next
  }

  /** Undo a dropColumn retirement after a LOST commit race — but only
    * when the COMMITTED schema still carries the column: the writer
    * that won the race may have been a concurrent dropColumn of the
    * SAME column, whose committed drop needs the (shared) retirement
    * this loser would otherwise strip, silently disabling the
    * byte-resurrection guard. When the committed schema is unknown
    * (pre-schema-log store) the retirement is conservatively KEPT — a
    * retired-but-live name is harmless (the merge guard ignores names
    * still in the table schema), an unguarded dropped one is not.
    */
  private[operators] def rollbackRetirement(dir: String, colName: String): Unit =
    updateDroppedCols(dir) { cur =>
      // re-read inside the transform: fresh on every lost-race retry,
      // and dropColumn's post-commit re-assert covers the remaining
      // retired-but-not-yet-committed window
      val colStillInSchema = committedGen(dir)
        .flatMap(g => schemaAt(dir, g))
        .exists(_.fieldNames.exists(_.equalsIgnoreCase(colName)))
      if (colStillInSchema) cur - colName else cur
    }

  // ---- CHECK constraints ----
  //
  // Delta's table-constraint surface (ALTER TABLE ADD CONSTRAINT …
  // CHECK) on this layer: named boolean SQL expressions that every
  // mutation must uphold. ANSI CHECK semantics — a row passes when the
  // expression is TRUE or UNKNOWN (null), fails only on FALSE. NOT
  // NULL is just `c IS NOT NULL`. Enforcement reads the STAGED files
  // of the committing generation (one columnar pass over the band the
  // mutation rewrote, never the table) BEFORE the commit-log link, so
  // a violating batch leaves the table untouched at the previous
  // generation — readers never observe a constraint-breaking row.
  // [[restore]] and [[compact]] re-reference/rewrite rows that already
  // passed, so they skip the check (Delta's posture: constraints gate
  // NEW data).

  private def renderConstraints(m: Map[String, String]): String =
    if (m.isEmpty) ""
    else m.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
  private def parseConstraints(dir: String, content: String): Map[String, String] =
    content.linesIterator.filter(_.nonEmpty).map { l =>
      val kv = l.split("=", 2)
      require(kv.length == 2, s"malformed _constraints line in $dir: '$l'")
      kv(0) -> kv(1)
    }.toMap

  /** Active CHECK constraints: name -> boolean SQL expression. */
  def checkConstraints(dir: String): Map[String, String] =
    parseConstraints(dir, governRead(dir, "_constraints")._2)

  private def writeConstraintsFile(dir: String, m: Map[String, String]): Unit = {
    governCas(dir, "_constraints")(_ => renderConstraints(m)); ()
  }

  /** ALTER TABLE ADD CONSTRAINT (Delta semantics): the EXISTING rows
    * must already satisfy the expression — one scan at add time, loud
    * failure with sample rows — then the constraint persists under
    * the governance CAS (the duplicate-name check re-runs inside the
    * transform, so two racing adds of one name can't both land) and
    * gates every subsequent [[merge]]/[[updateWhere]]/[[upsertSink]].
    */
  def addCheckConstraint(s: SparkSession, dir: String, name: String,
                         exprSql: String): Unit = {
    require(name.matches("[A-Za-z0-9_\\-]+"),
      s"constraint name '$name' must match [A-Za-z0-9_-]+")
    // the store is line-oriented; a multi-line expression would corrupt
    // it and brick every later mutation's checkConstraints parse
    require(!exprSql.exists(c => c == '\n' || c == '\r'),
      "constraint expression must be single-line")
    require(!checkConstraints(dir).contains(name),
      s"constraint '$name' already exists on $dir")
    val sample = readTable(s, dir)
      .filter(coalesce(expr(exprSql), lit(true)) === lit(false))
      .limit(3).collect()
    if (sample.nonEmpty) throw new IllegalStateException(
      s"cannot add CHECK constraint '$name' ($exprSql) on $dir: existing rows " +
        s"violate it, e.g. ${sample.mkString("; ")}")
    governCas(dir, "_constraints") { content =>
      val cur = parseConstraints(dir, content)
      require(!cur.contains(name), s"constraint '$name' already exists on $dir")
      renderConstraints(cur + (name -> exprSql))
    }
    ()
  }

  /** Returns whether the constraint existed. */
  def dropCheckConstraint(dir: String, name: String): Boolean = {
    var existed = false
    governCas(dir, "_constraints") { content =>
      val cur = parseConstraints(dir, content)
      existed = cur.contains(name)
      renderConstraints(cur - name)
    }
    existed
  }

  /** Validate a committing generation's staged files; on the first
    * violating constraint, delete the staged dirs and fail naming the
    * constraint + sample rows. Cost: one filter+limit job per
    * constraint over the STAGED band (columnar, ~always a small
    * fraction of the table); zero cost with no constraints.
    */
  private def enforceConstraintsStaged(s: SparkSession, dir: String,
                                       staging: String, cleanup: Seq[String],
                                       opName: String): Unit = {
    val cons = checkConstraints(dir)
    if (cons.isEmpty || !hasParquetFiles(staging)) return
    val df = s.read.parquet(staging)
    // ONE columnar pass for every constraint: tag each row with the
    // names it violates, keep any — k constraints don't cost k scans
    val viols = array(cons.toSeq.sorted.map { case (n, e) =>
      when(coalesce(expr(e), lit(true)) === lit(false), lit(n)) }: _*)
    val bad = df.withColumn("__viol", array_compact(viols))
      .filter(size(col("__viol")) > 0).limit(3).collect()
    if (bad.nonEmpty) {
      cleanup.foreach(graft.IndexLifecycle.deleteRecursively)
      val name = bad.head.getAs[scala.collection.Seq[String]]("__viol").head
      throw new IllegalStateException(
        s"$opName on $dir rejected by CHECK constraint '$name' " +
          s"(${cons(name)}); sample violating rows: ${bad.mkString("; ")}")
    }
  }

  // ---- streaming upsert sink ----

  /** An idempotent `foreachBatch` body applying each micro-batch of
    * CDC rows (`op` ∈ U/D/I, same contract as [[merge]]) to the keyed
    * table — the streaming write side of the table format. Replay
    * safety is the Sinks.scala contract: the last applied batchId
    * rides the commit marker's metadata, so the generation and the
    * batch watermark flip in one atomic commit-log link; a restarted query
    * re-offering an applied batch is a no-op, and a crash between
    * merge work and marker flip replays onto the intact previous
    * generation (merge sweeps the orphaned next-gen dirs itself).
    */
  def upsertSink(dir: String, keyCol: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      // a concurrent non-stream writer (merge/compact) can win a
      // generation under us — that is the OCC contract, not an
      // error; re-read the base and retry the batch (bounded, so a
      // genuinely stuck table still fails the query loudly)
      var attempts = 0
      var done = false
      while (!done) {
        val applied = committedMeta(dir).get("batch").map(_.toLong)
        if (applied.exists(_ >= batchId)) done = true // replay: no-op
        else {
          attempts += 1
          try {
            merge(batch.sparkSession, dir, batch, keyCol,
              meta = Map("batch" -> batchId.toString))
            done = true
          } catch {
            case e: java.util.ConcurrentModificationException =>
              if (attempts >= 20) throw e
          }
        }
      }
    }

  // ---- q59: the registered query ----

  /** q56's MERGE answer, computed through the physical pruned path:
    * build the customer dimension as a 16-file keyed table, derive
    * the change batch from the BOTTOM EIGHTH of the key space
    * (`k * 8 <= max(k)` — integer-exact on both engines), merge, and
    * return the committed table. The banded batch is what makes the
    * row meaningful: ~2 of 16 files intersect it, so the merge must
    * carry ~14 files by reference and still hash-match DuckDB's
    * whole-table MERGE — the pruning's correctness is under the gate,
    * not just its speed. Fresh per-process dir each call (pp12's
    * discipline): the gate always pays the full build + merge.
    */
  /** Shared fixture for the q59/q60/q61 family: the customer
    * dimension as a 16-file keyed table with the banded change batch
    * merged in (gen 0 → 1). Fresh per-process/per-session dir each
    * call (pp12's discipline): the gate always pays the full build +
    * merge. The `tag` keeps the three registered queries out of each
    * other's dirs when one Verify run executes all of them.
    */
  // Every fixture dir the registered q59-q68 rows materialize, for
  // [[cleanupFixtures]]: the dirs are keyed per (process, session) so
  // nothing reuses them across bench reps / verify runs — without a
  // sweep each rep leaks ~10 16-file customer-table copies into
  // java.io.tmpdir.
  private val fixtureDirs = collection.mutable.LinkedHashSet.empty[String]

  private def fixtureDir(s: SparkSession, d: String, tag: String): String = {
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft-$tag-" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(d) & 0xffffffffL) +
        "-p" + ProcessHandle.current().pid() +
        "-s" + java.lang.Integer.toHexString(System.identityHashCode(s))).toString
    fixtureDirs.synchronized { fixtureDirs += dir }
    dir
  }

  /** Delete every fixture dir the registered table-format rows have
    * created in this JVM (bench per-rep / verify end-of-run hygiene;
    * fixtures are rebuilt from scratch on every query call anyway).
    * Returns how many dirs were swept.
    */
  def cleanupFixtures(): Int = fixtureDirs.synchronized {
    val n = fixtureDirs.size
    fixtureDirs.foreach(dir =>
      scala.util.Try(graft.IndexLifecycle.deleteRecursively(dir)))
    fixtureDirs.clear()
    n
  }

  private def mergedFixture(s: SparkSession, d: String, tag: String): String = {
    val dir = fixtureDir(s, d, tag)
    val t = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
    write(s, t, "k", dir, nFiles = 16)
    val maxK = t.agg(max(col("k")).cast("long")).head().getLong(0)
    val band = col("k") * 8 <= lit(maxK)
    val upd = t.filter(band && col("k") % 5 === 0 && col("k") % 7 =!= 0)
      .select(col("k"), lit("U").as("op"), lit("WEB").as("seg"),
        (col("bal") + 100).as("bal"))
    val del = t.filter(band && col("k") % 7 === 0)
      .select(col("k"), lit("D").as("op"), lit(null).cast("string").as("seg"),
        lit(null).cast("double").as("bal"))
    val ins = t.filter(band && col("k") % 5 === 1)
      .select((col("k") + 10000000L).as("k"), lit("I").as("op"),
        col("seg"), col("bal"))
    merge(s, dir, upd.unionByName(del).unionByName(ins), "k")
    dir
  }

  val q59_merge_pruned: Q = (s, d) => {
    val dir = mergedFixture(s, d, "mergetab")
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q60: the manifest-pruned CDC read over the q59 merge — the
    * LOGICAL I/U/D delta recovered from the physical file diff
    * (carried files skipped entirely), hash-matched against the
    * change set DuckDB derives declaratively from the same CTEs.
    * Incremental consumers (a downstream index, a feature store, a
    * replica) tail exactly this instead of re-reading the table.
    */
  val q60_merge_cdc: Q = (s, d) => {
    val dir = mergedFixture(s, d, "mergecdc")
    changesBetween(s, dir, 0, 1, "k")
      .select(col("k"), col("change_op"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k", "change_op")
  }

  /** q61: q59's answer through a THIRD physical path — merge, then
    * fold every file into a compacted generation and read THAT. Same
    * oracle text as q59 (the ann01/ann03 pattern: one oracle, two
    * physical strategies): compaction must be invisible to readers.
    */
  val q61_compacted_read: Q = (s, d) => {
    val dir = mergedFixture(s, d, "mergecpt")
    val total = readTable(s, dir).count()
    compact(s, dir, "k", targetRows = math.max(1L, total))
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q62: the data-skipping read — a key-band scan over the merged
    * table that consults the manifest before opening anything (the
    * band here sits ABOVE the merge's rewritten eighth, so it reads
    * only carried gen-0 files: pruning across generations). Oracle is
    * q59's merged result with the same band predicate.
    */
  val q62_skipped_scan: Q = (s, d) => {
    val dir = mergedFixture(s, d, "mergescan")
    val maxK = Tables.customer(s, d)
      .agg(max(col("c_custkey")).cast("long")).head().getLong(0)
    scanRange(s, dir, "k", maxK / 4, maxK / 2)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q63: the q59 shape on a STRING-keyed table (c_name — zero-padded,
    * so the numeric band is also a lexicographic band and range
    * pruning stays selective). Manifest min/max keep the key's native
    * type; pruning is ordering-based, so nothing else changes — the
    * point of the row is that a uuid/name/date-keyed dimension gets
    * the same file-pruned merge as a numeric one, under the same
    * DuckDB hash gate.
    */
  val q63_merge_strkey: Q = (s, d) => {
    val dir = fixtureDir(s, d, "mergestr")
    val c = Tables.customer(s, d)
    val base = c.select(col("c_name").as("k"), col("c_mktsegment").as("seg"),
      col("c_acctbal").as("bal"))
    write(s, base, "k", dir, nFiles = 16)
    val maxK = c.agg(max(col("c_custkey")).cast("long")).head().getLong(0)
    val band = col("c_custkey") * 8 <= lit(maxK)
    val upd = c.filter(band && col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
      .select(col("c_name").as("k"), lit("U").as("op"), lit("WEB").as("seg"),
        (col("c_acctbal") + 100).as("bal"))
    val del = c.filter(band && col("c_custkey") % 7 === 0)
      .select(col("c_name").as("k"), lit("D").as("op"),
        lit(null).cast("string").as("seg"), lit(null).cast("double").as("bal"))
    val ins = c.filter(band && col("c_custkey") % 5 === 1)
      .select(concat(lit("ZZZ-"), col("c_name")).as("k"), lit("I").as("op"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
    merge(s, dir, upd.unionByName(del).unionByName(ins), "k")
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q64: q62's band read through CATALYST pushdown instead of the
    * explicit scanWhere — `readIndexed(...).filter(between)` and the
    * GraftFileIndex prunes the same files at plan time. Same oracle
    * text as q62 (one oracle, two pruning mechanisms): the integrated
    * path must be invisible to results.
    */
  val q64_indexed_scan: Q = (s, d) => {
    val dir = mergedFixture(s, d, "mergeidx")
    val maxK = Tables.customer(s, d)
      .agg(max(col("c_custkey")).cast("long")).head().getLong(0)
    readIndexed(s, dir)
      .filter(col("k") >= maxK / 4 && col("k") <= maxK / 2)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** Fresh UNmerged (k, seg, bal) keyed table for the DML rows —
    * q65/q66 exercise predicate DML against a clean generation 0, so
    * their oracles stay one predicate over `customer` instead of
    * compounding on the merge CTEs. Same per-process/per-session dir
    * discipline as [[mergedFixture]].
    */
  private def baseFixture(s: SparkSession, d: String, tag: String): (String, Long) = {
    val dir = fixtureDir(s, d, tag)
    val t = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
    write(s, t, "k", dir, nFiles = 16)
    val maxK = t.agg(max(col("k")).cast("long")).head().getLong(0)
    (dir, maxK)
  }

  /** q65: predicate DELETE — `DELETE WHERE k BETWEEN m/4 AND m/2` on
    * the 16-file table. The band covers a quarter of the key space,
    * so interior files DROP metadata-only and only the two boundary
    * files rewrite — while the surviving rows must still hash-match
    * DuckDB's declarative complement filter. The triage's correctness
    * (not just its speed) is what sits under the gate.
    */
  val q65_delete_where: Q = (s, d) => {
    val (dir, maxK) = baseFixture(s, d, "deltab")
    deleteWhere(s, dir, "k", "k", Some(maxK / 4), Some(maxK / 2))
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q66: predicate UPDATE — `SET seg = 'WEB', bal = bal + 100 WHERE
    * k BETWEEN m/4 AND m/2`. Out-of-band files carry by reference;
    * the result must hash-match DuckDB's CASE projection over the
    * whole table.
    */
  val q66_update_where: Q = (s, d) => {
    val (dir, maxK) = baseFixture(s, d, "updtab")
    updateWhere(s, dir, "k", "k", Some(maxK / 4), Some(maxK / 2),
      Map("seg" -> lit("WEB"), "bal" -> (col("bal") + 100)))
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q67: RESTORE under the gate — merge a change batch (gen 1), then
    * [[restore]] to generation 0 (committed as gen 2) and read. The
    * result must hash-match the UNTOUCHED base dimension: a rollback
    * that leaks any merged row, or misses one, fails the oracle. The
    * interesting machinery (manifest re-reference, no data copied,
    * inverse CDC delta) is spec-asserted; the gate pins the
    * user-visible contract.
    */
  val q67_restore: Q = (s, d) => {
    val dir = mergedFixture(s, d, "restoretab")
    restore(s, dir, 0)
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q68: SHALLOW CLONE under the gate — clone the unmerged base,
    * merge the q59 change batch ON THE CLONE, read the clone. Same
    * oracle text as q59 (one oracle, two table lineages): a clone
    * whose merge touches shared state, or whose carried-by-reference
    * files resolve wrongly across directories, diverges from the
    * declarative MERGE. Source-table isolation is spec-asserted.
    */
  val q68_clone: Q = (s, d) => {
    val (srcDir, maxK) = baseFixture(s, d, "clonesrc")
    val dir = srcDir + "-clone"
    fixtureDirs.synchronized { fixtureDirs += dir }
    graft.IndexLifecycle.deleteRecursively(dir)
    cloneTable(s, srcDir, dir)
    val t = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
    val band = col("k") * 8 <= lit(maxK)
    val upd = t.filter(band && col("k") % 5 === 0 && col("k") % 7 =!= 0)
      .select(col("k"), lit("U").as("op"), lit("WEB").as("seg"),
        (col("bal") + 100).as("bal"))
    val del = t.filter(band && col("k") % 7 === 0)
      .select(col("k"), lit("D").as("op"), lit(null).cast("string").as("seg"),
        lit(null).cast("double").as("bal"))
    val ins = t.filter(band && col("k") % 5 === 1)
      .select((col("k") + 10000000L).as("k"), lit("I").as("op"),
        col("seg"), col("bal"))
    merge(s, dir, upd.unionByName(del).unionByName(ins), "k")
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q69: INCREMENTAL VIEW MAINTENANCE under the gate — the per-seg
    * (count, sum) aggregate advanced from its generation-0 state by
    * folding in the merge's pre-image CDC delta, never re-reading the
    * merged table. The oracle recomputes the aggregate declaratively
    * over the merged result: a maintenance rule that loses a
    * retraction, double-counts an update, or mis-nets the span fails
    * the hash. Sums run over DECIMAL cents — the exact-arithmetic
    * regime IncrementalView enforces (a raw double sum is rejected
    * there) — and the final projection casts back through double so
    * both engines perform the identical IEEE cents/100 division.
    */
  val q69_incremental_mv: Q = (s, d) => {
    val dir = mergedFixture(s, d, "mvtab")
    val spec = IncrementalView.ViewSpec(Seq("seg"),
      Seq("cents" -> "cast(round(bal * 100) as decimal(38,0))"))
    val base = IncrementalView.compute(readTable(s, dir, asOf = Some(0)), spec)
    val delta = changesBetween(s, dir, 0, 1, "k", preImages = true)
    IncrementalView.applyDelta(base, delta, spec)
      .select(col("seg"), col("mv_count").as("cnt"),
        (col("cents").cast("double") / 100).as("sum_bal"))
      .orderBy("seg")
  }

  /** q70: Bloom-sidecar POINT LOOKUP under the gate — equality probe
    * on a high-cardinality column (md5 of the name: deterministic,
    * reproducible in DuckDB, and uncorrelated with the key layout, so
    * min/max stats are structurally useless and the sidecar is the
    * only thing standing between the probe and 16 file opens). The
    * oracle is the declarative filter; a sketch that false-negatives
    * the needle's file returns zero rows and fails rows_match.
    * Pruning itself (≤ a few candidates of 16) is spec-asserted.
    */
  val q70_bloom_lookup: Q = (s, d) => {
    val dir = fixtureDir(s, d, "bloomtab")
    val c = Tables.customer(s, d)
    val base = c.select(col("c_custkey").as("k"),
      md5(col("c_name").cast("binary")).as("tag"),
      col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
    write(s, base, "k", dir, nFiles = 16)
    buildBloomIndex(s, dir, "tag")
    val maxK = c.agg(max(col("c_custkey")).cast("long")).head().getLong(0)
    val needle = base.filter(col("k") === maxK / 3).select("tag").head().getString(0)
    scanEqualsBloom(s, dir, "tag", needle)
      .select(col("k"), col("tag"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q71: DROP COLUMN under the gate — drop a column from the base
    * dimension (metadata-only), then run the q59 banded merge ON THE
    * POST-DROP TABLE and read. The oracle is the merged CTE without
    * the column: a drop that leaks the column, breaks the schema-in-
    * log projection on carried files, or corrupts the later merge's
    * schema union fails the hash. The zero-IO/retirement machinery is
    * spec-asserted; the gate pins the user-visible contract.
    */
  val q71_dropcol_merge: Q = (s, d) => {
    val dir = fixtureDir(s, d, "dropcoltab")
    val t = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_name").as("note"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
    write(s, t, "k", dir, nFiles = 16)
    dropColumn(s, dir, "k", "note")
    val maxK = t.agg(max(col("k")).cast("long")).head().getLong(0)
    val band = col("k") * 8 <= lit(maxK)
    val upd = t.filter(band && col("k") % 5 === 0 && col("k") % 7 =!= 0)
      .select(col("k"), lit("U").as("op"), lit("WEB").as("seg"),
        (col("bal") + 100).as("bal"))
    val del = t.filter(band && col("k") % 7 === 0)
      .select(col("k"), lit("D").as("op"), lit(null).cast("string").as("seg"),
        lit(null).cast("double").as("bal"))
    val ins = t.filter(band && col("k") % 5 === 1)
      .select((col("k") + 10000000L).as("k"), lit("I").as("op"),
        col("seg"), col("bal"))
    merge(s, dir, upd.unionByName(del).unionByName(ins), "k")
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q72: RECLUSTER under the gate — the q59 merged table rewritten
    * in place on the z-order of (k, bal), then read. Same oracle text
    * as q59 (one oracle, N physical strategies — the q61 pattern):
    * layout maintenance must be invisible to results. The pruning
    * payoff and zero-CDC property are spec-asserted.
    */
  val q72_reclustered_read: Q = (s, d) => {
    val dir = mergedFixture(s, d, "reclustab")
    recluster(s, dir, "k", Seq("k", "bal"))
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q73: MAINTAINED Bloom sidecar under the gate — build the index,
    * run the q59-shaped banded merge (which folds the new files'
    * sketches into the sidecar at commit, no rebuild), then answer a
    * batched IN-probe whose three needles each exercise one coverage
    * class: a tag whose row the merge REWROTE (update kept the tag,
    * moved the row to a new file — only the maintained fold covers
    * it), an untouched carried row, and a tag that exists only in an
    * INSERTED row. The oracle is the declarative IN filter over the
    * merged CTEs: a fold that drops a sketch (false negative on the
    * rewritten/inserted file) loses a row and fails the hash. The
    * pruning itself (candidates stay ~1/16 across merges WITHOUT a
    * rebuild) is spec-asserted in BloomIndexSpec.
    */
  val q73_bloom_maintained: Q = (s, d) => {
    val dir = fixtureDir(s, d, "bloommnt")
    val c = Tables.customer(s, d)
    val base = c.select(col("c_custkey").as("k"),
      md5(col("c_name").cast("binary")).as("tag"),
      col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
    write(s, base, "k", dir, nFiles = 16)
    buildBloomIndex(s, dir, "tag")
    val maxK = c.agg(max(col("c_custkey")).cast("long")).head().getLong(0)
    val bandC = col("c_custkey") * 8 <= lit(maxK)
    val upd = c.filter(bandC && col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey").as("k"), lit("U").as("op"),
        lit(null).cast("string").as("tag"), // null keeps the old tag (q56 overlay)
        lit("WEB").as("seg"), (col("c_acctbal") + 100).as("bal"))
    val del = c.filter(bandC && col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("k"), lit("D").as("op"),
        lit(null).cast("string").as("tag"), lit(null).cast("string").as("seg"),
        lit(null).cast("double").as("bal"))
    val ins = c.filter(bandC && col("c_custkey") % 5 === 1)
      .select((col("c_custkey") + 10000000L).as("k"), lit("I").as("op"),
        md5(concat(lit("Z"), col("c_name")).cast("binary")).as("tag"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
    merge(s, dir, upd.unionByName(del).unionByName(ins), "k")
    // needles, each derived deterministically on both engines
    val kRewrote = c.filter(bandC && col("c_custkey") % 5 === 0 &&
        col("c_custkey") % 7 =!= 0)
      .agg(max(col("c_custkey")).cast("long")).head().getLong(0)
    val kIns = c.filter(bandC && col("c_custkey") % 5 === 1)
      .agg(max(col("c_custkey")).cast("long")).head().getLong(0)
    def tagOf(k: Long, z: Boolean) = c.filter(col("c_custkey") === k)
      .select(md5((if (z) concat(lit("Z"), col("c_name")) else col("c_name"))
        .cast("binary"))).head().getString(0)
    val needles = Seq(tagOf(kRewrote, z = false), tagOf(maxK / 2, z = false),
      tagOf(kIns, z = true))
    scanEqualsBloomIn(s, dir, "tag", needles)
      .select(col("k"), col("tag"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** [[mergedFixture]] on a Z-CLUSTERED base: writeClustered on
    * (k, bal), then the same banded change batch — the setup whose
    * layout a PARTIAL recluster is meant to repair.
    */
  private def clusteredMergedFixture(s: SparkSession, d: String, tag: String): String = {
    val dir = fixtureDir(s, d, tag)
    val t = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
    writeClustered(s, t, "k", Seq("k", "bal"), dir, nFiles = 16)
    val maxK = t.agg(max(col("k")).cast("long")).head().getLong(0)
    val band = col("k") * 8 <= lit(maxK)
    val upd = t.filter(band && col("k") % 5 === 0 && col("k") % 7 =!= 0)
      .select(col("k"), lit("U").as("op"), lit("WEB").as("seg"),
        (col("bal") + 100).as("bal"))
    val del = t.filter(band && col("k") % 7 === 0)
      .select(col("k"), lit("D").as("op"), lit(null).cast("string").as("seg"),
        lit(null).cast("double").as("bal"))
    val ins = t.filter(band && col("k") % 5 === 1)
      .select((col("k") + 10000000L).as("k"), lit("I").as("op"),
        col("seg"), col("bal"))
    merge(s, dir, upd.unionByName(del).unionByName(ins), "k")
    dir
  }

  /** q74: PARTIAL recluster under the gate — the banded merge on a
    * z-clustered base strews key-ordered band files across the
    * layout; [[reclusterPartial]] rewrites ONLY those files (the
    * still-clustered majority carries by reference) and the read must
    * still equal q59's declarative MERGE (the q61/q72 one-oracle-N-
    * strategies pattern). That only-the-degraded-files-touched claim
    * (mtime-pinned carries) and the restored admission are
    * spec-asserted in ReclusterSpec.
    */
  val q74_partial_recluster: Q = (s, d) => {
    val dir = clusteredMergedFixture(s, d, "preclus")
    reclusterPartial(s, dir, "k", Seq("k", "bal"))
    readTable(s, dir)
      .select(col("k"), col("seg"), r2(col("bal")).as("bal"))
      .orderBy("k")
  }

  /** q75: scattered-key DELETE via a deletion-vector commit — every
    * 97th custkey, spread across the whole key range: the shape where
    * [[deleteWhere]]'s banding degenerates to a near-full rewrite and
    * [[deleteKeys]] writes ∝ deleted rows instead, data files
    * byte-identical (spec-asserted). The read aggregates THROUGH the
    * vector anti-join; the oracle is the plain NOT-filtered
    * aggregation — any resurrected or over-hidden row breaks the hash.
    */
  val q75_dv_delete: Q = (s, d) => {
    val dir = fixtureDir(s, d, "dvtab")
    val t = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
    write(s, t, "k", dir, nFiles = 16)
    deleteKeys(s, dir, "k", t.filter(col("k") % 97 === 0).select("k"))
    readTable(s, dir)
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("bal") * 100).cast("long")).as("cents"))
      .orderBy("seg")
  }

  val registry: Map[String, Q] = Map(
    "q75_dv_delete" -> q75_dv_delete,
    "q73_bloom_maintained" -> q73_bloom_maintained,
    "q74_partial_recluster" -> q74_partial_recluster,
    "q67_restore" -> q67_restore,
    "q68_clone" -> q68_clone,
    "q69_incremental_mv" -> q69_incremental_mv,
    "q70_bloom_lookup" -> q70_bloom_lookup,
    "q71_dropcol_merge" -> q71_dropcol_merge,
    "q72_reclustered_read" -> q72_reclustered_read,
    "q59_merge_pruned" -> q59_merge_pruned,
    "q60_merge_cdc" -> q60_merge_cdc,
    "q61_compacted_read" -> q61_compacted_read,
    "q62_skipped_scan" -> q62_skipped_scan,
    "q63_merge_strkey" -> q63_merge_strkey,
    "q64_indexed_scan" -> q64_indexed_scan,
    "q65_delete_where" -> q65_delete_where,
    "q66_update_where" -> q66_update_where)

  val oracles: Map[String, String] = Map(
    // deletion-vector delete ≡ declarative NOT-IN filter
    "q75_dv_delete" ->
      """SELECT c_mktsegment AS seg, count(*) AS n,
        |  cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint) AS cents
        |FROM customer WHERE c_custkey % 97 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the q59 merge CTEs carrying a tag column, probed by a 3-needle
    // IN filter — the fold-maintained sidecar must surface exactly a
    // rewritten row's kept tag, an untouched row's tag, and an
    // inserted row's new tag
    "q73_bloom_maintained" ->
      """WITH t AS (SELECT c_custkey AS k, c_name AS name, md5(c_name) AS tag,
        |             c_mktsegment AS seg, c_acctbal AS bal FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal FROM t, mx
        |        WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, md5('Z' || name) AS tag, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1),
        |merged AS (
        |  SELECT t.k, t.tag, coalesce(u.u_seg, t.seg) AS seg,
        |         coalesce(u.u_bal, t.bal) AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL SELECT k, tag, seg, bal FROM ins),
        |needles AS (
        |  SELECT md5(name) AS tag FROM t, mx
        |  WHERE k = (SELECT max(k) FROM t, mx
        |             WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0)
        |  UNION ALL
        |  SELECT md5(name) FROM t, mx WHERE k = m // 2
        |  UNION ALL
        |  SELECT md5('Z' || name) FROM t, mx
        |  WHERE k = (SELECT max(k) FROM t, mx
        |             WHERE k * 8 <= m AND k % 5 = 1))
        |SELECT k, tag, seg, round(bal * 100) / 100 AS bal
        |FROM merged WHERE tag IN (SELECT tag FROM needles)
        |ORDER BY k""".stripMargin,
    // q59's oracle verbatim — partial layout maintenance must be
    // invisible to readers (the q61/q72 pattern)
    "q74_partial_recluster" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z
        |ORDER BY k""".stripMargin,
    // the delta-maintained aggregate must equal the declarative
    // group-by over the merged table (same CTEs the merge consumed);
    // integer-cents sums make both association orders exact
    "q69_incremental_mv" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1),
        |merged AS (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    coalesce(u.u_bal, t.bal) AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, bal FROM ins)
        |SELECT seg, count(*) AS cnt, sum(round(bal * 100)) / 100 AS sum_bal
        |FROM merged GROUP BY seg ORDER BY seg""".stripMargin,
    // the declarative needle filter — the bloom-pruned read must
    // surface exactly the matching row(s)
    "q70_bloom_lookup" ->
      """WITH t AS (SELECT c_custkey AS k, md5(c_name) AS tag,
        |             c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer)
        |SELECT k, tag, seg, round(bal * 100) / 100 AS bal
        |FROM t, mx
        |WHERE tag = (SELECT md5(c_name) FROM customer, mx WHERE c_custkey = m // 3)
        |ORDER BY k""".stripMargin,
    // the q59 MERGE applied AFTER a metadata-only column drop — the
    // result must equal the declarative merge with the column absent
    "q71_dropcol_merge" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z
        |ORDER BY k""".stripMargin,
    // q59's oracle verbatim — in-place reclustering must be invisible
    // to readers (the q61 one-oracle-N-strategies pattern)
    "q72_reclustered_read" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z
        |ORDER BY k""".stripMargin,
    // restore-to-gen-0 must surface the base dimension untouched —
    // any merged row leaking through the rollback breaks the hash
    "q67_restore" ->
      """SELECT c_custkey AS k, c_mktsegment AS seg,
        |  round(c_acctbal * 100) / 100 AS bal
        |FROM customer ORDER BY k""".stripMargin,
    // q59's oracle verbatim — a merge against the shallow clone must
    // equal the declarative MERGE over the source rows
    "q68_clone" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z
        |ORDER BY k""".stripMargin,
    // q56's oracle with the band applied to the change CTEs — the
    // file-pruned path must equal the declarative whole-table MERGE
    "q59_merge_pruned" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z
        |ORDER BY k""".stripMargin,
    // the logical change set derived declaratively from the SAME
    // CTEs the merge consumed — the file-diff CDC must reproduce it
    "q60_merge_cdc" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, change_op, seg, bal FROM (
        |  SELECT k, 'U' AS change_op, u_seg AS seg,
        |    round(u_bal * 100) / 100 AS bal FROM upd
        |  UNION ALL
        |  SELECT d.k, 'D', t.seg, round(t.bal * 100) / 100
        |  FROM del d JOIN t ON t.k = d.k
        |  UNION ALL
        |  SELECT k, 'I', seg, round(bal * 100) / 100 FROM ins) z
        |ORDER BY k, change_op""".stripMargin,
    // q59's oracle verbatim — compaction must be invisible to readers
    "q61_compacted_read" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z
        |ORDER BY k""".stripMargin,
    // q59's merged result under the band predicate — the pruned scan
    // must return exactly the declarative filter's rows
    "q62_skipped_scan" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z, mx
        |WHERE z.k >= mx.m // 4 AND z.k <= mx.m // 2
        |ORDER BY k""".stripMargin,
    // q62's oracle verbatim: the Catalyst-pushdown path must compute
    // the same band
    "q64_indexed_scan" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT k, 'WEB' AS u_seg, bal + 100 AS u_bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 0 AND k % 7 <> 0),
        |del AS (SELECT k FROM t, mx WHERE k * 8 <= m AND k % 7 = 0),
        |ins AS (SELECT k + 10000000 AS k, seg, bal
        |        FROM t, mx WHERE k * 8 <= m AND k % 5 = 1)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z, mx
        |WHERE z.k >= mx.m // 4 AND z.k <= mx.m // 2
        |ORDER BY k""".stripMargin,
    // the q59 MERGE on the string key — same change rules keyed by
    // c_custkey, applied through c_name
    "q63_merge_strkey" ->
      """WITH mx AS (SELECT max(c_custkey) AS m FROM customer),
        |upd AS (SELECT c_name AS k, 'WEB' AS u_seg, c_acctbal + 100 AS u_bal
        |        FROM customer, mx
        |        WHERE c_custkey * 8 <= m AND c_custkey % 5 = 0 AND c_custkey % 7 <> 0),
        |del AS (SELECT c_name AS k FROM customer, mx
        |        WHERE c_custkey * 8 <= m AND c_custkey % 7 = 0),
        |ins AS (SELECT 'ZZZ-' || c_name AS k, c_mktsegment AS seg, c_acctbal AS bal
        |        FROM customer, mx
        |        WHERE c_custkey * 8 <= m AND c_custkey % 5 = 1),
        |t AS (SELECT c_name AS k, c_mktsegment AS seg, c_acctbal AS bal FROM customer)
        |SELECT k, seg, bal FROM (
        |  SELECT t.k, coalesce(u.u_seg, t.seg) AS seg,
        |    round((coalesce(u.u_bal, t.bal)) * 100) / 100 AS bal
        |  FROM t LEFT JOIN upd u USING (k)
        |  WHERE t.k NOT IN (SELECT k FROM del)
        |  UNION ALL
        |  SELECT k, seg, round(bal * 100) / 100 AS bal FROM ins) z
        |ORDER BY k""".stripMargin,
    // the declarative complement of the delete band — the triaged
    // (drop/rewrite/carry) physical path must keep exactly these rows
    "q65_delete_where" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer)
        |SELECT k, seg, round(bal * 100) / 100 AS bal FROM t, mx
        |WHERE NOT (k >= m // 4 AND k <= m // 2)
        |ORDER BY k""".stripMargin,
    // the declarative CASE projection of the update band — carried
    // files must keep old values, rewritten files the new ones
    "q66_update_where" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |           FROM customer),
        |mx AS (SELECT max(c_custkey) AS m FROM customer)
        |SELECT k,
        |  CASE WHEN k >= m // 4 AND k <= m // 2 THEN 'WEB' ELSE seg END AS seg,
        |  round((CASE WHEN k >= m // 4 AND k <= m // 2 THEN bal + 100 ELSE bal END)
        |        * 100) / 100 AS bal
        |FROM t, mx
        |ORDER BY k""".stripMargin)
}
