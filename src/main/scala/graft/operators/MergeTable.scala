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
object MergeTable
    extends MergeTableLog
    with MergeTableStorage
    with MergeTableBloom
    with MergeTableDeltas
    with MergeTableGovernance
    with MergeTableDml {
  type Q = (SparkSession, String) => DataFrame

  private def r2(c: Column) = round(c * 100) / 100

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

  /** max over the freshly-written table's manifest `max_<c>` stats —
    * the driver-priced replacement for a whole-table max() scan in
    * the fixture builds (r21). Exact for long keys: long stats are
    * never truncated, and max(col) ≡ max over per-file maxes. Any
    * null stat falls back to the scan so the value can never drift.
    */
  private def manifestMaxLong(s: SparkSession, dir: String, c: String,
                              asOf: Option[Int] = None): Option[Long] = {
    val gen = asOf.orElse(committedGen(dir)).getOrElse(return None)
    // per-file max stats are the exact table max only when no deletion
    // vector hides rows (a hidden row could BE the max) — scan fallback
    if (dvSegments(dir, gen).nonEmpty) return None
    val (schema, rows) = manifestRowsAt(s, dir, gen)
    val i = schema.fieldNames.indexOf(s"max_$c")
    if (i < 0 || rows.isEmpty) return None
    val vals = rows.map(_.get(i) match {
      case n: java.lang.Long => n.longValue
      case n: java.lang.Integer => n.longValue
      case _ => return None // null or non-integral stat: scan fallback
    })
    Some(vals.max)
  }

  private def mergedFixture(s: SparkSession, d: String, tag: String): String = {
    val dir = fixtureDir(s, d, tag)
    val t = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
    write(s, t, "k", dir, nFiles = 16)
    val maxK = manifestMaxLong(s, dir, "k").getOrElse(
      t.agg(max(col("k")).cast("long")).head().getLong(0))
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
    // visible row count off the manifest (driver-priced, r21): the
    // fixture is vector-free and its n_rows stats are footer-exact,
    // so Σ n_rows ≡ readTable().count(); any null stat or a standing
    // deletion vector falls back to the scan-based count
    val gen = committedGen(dir).getOrElse(0)
    val (manSchema, manRows) = manifestRowsAt(s, dir, gen)
    val nIdx = manSchema.fieldNames.indexOf("n_rows")
    val total =
      if (dvSegments(dir, gen).isEmpty && nIdx >= 0 && manRows.nonEmpty &&
          !manRows.exists(_.isNullAt(nIdx)))
        manRows.map(_.getLong(nIdx)).sum
      else readTable(s, dir).count()
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
    // max(c_custkey) ≡ the GEN-0 manifest's max_k (the base write is
    // exactly the customer projection; the merged head would include
    // the +10M inserts) — driver-priced instead of a source scan
    val maxK = manifestMaxLong(s, dir, "k", asOf = Some(0)).getOrElse(
      Tables.customer(s, d)
        .agg(max(col("c_custkey")).cast("long")).head().getLong(0))
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
    val maxK = manifestMaxLong(s, dir, "k", asOf = Some(0)).getOrElse(
      Tables.customer(s, d)
        .agg(max(col("c_custkey")).cast("long")).head().getLong(0))
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
    val maxK = manifestMaxLong(s, dir, "k").getOrElse(
      t.agg(max(col("k")).cast("long")).head().getLong(0))
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

  /** q76: IVM with MIN/MAX under the gate (r20) — q69's per-seg view
    * extended with min(bal)/max(bal), advanced through the merge's
    * pre-image delta. min/max cannot fold from the delta (the merge
    * DELETES rows, some of them group extremes — retraction forces a
    * re-read), so [[IncrementalView.applyDeltaWithSource]] recomputes
    * the extremes for exactly the AFFECTED groups from the source at
    * the span's end generation while counts/sums still fold; the
    * oracle recomputes everything declaratively over the merged CTEs,
    * so a stitch that loses a retracted max, leaks an unaffected
    * group's stale extreme, or mis-scopes the recompute fails the
    * hash.
    */
  val q76_mv_minmax: Q = (s, d) => {
    val dir = mergedFixture(s, d, "mvminmax")
    val spec = IncrementalView.ViewSpec(Seq("seg"),
      Seq("cents" -> "cast(round(bal * 100) as decimal(38,0))"),
      mins = Seq("min_bal" -> "bal"),
      maxs = Seq("max_bal" -> "bal"))
    val base = IncrementalView.compute(readTable(s, dir, asOf = Some(0)), spec)
    val delta = changesBetween(s, dir, 0, 1, "k", preImages = true)
    IncrementalView.applyDeltaWithSource(base, delta, spec, readTable(s, dir))
      .select(col("seg"), col("mv_count").as("cnt"),
        (col("cents").cast("double") / 100).as("sum_bal"),
        r2(col("min_bal")).as("min_bal"), r2(col("max_bal")).as("max_bal"))
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
    val maxK = manifestMaxLong(s, dir, "k").getOrElse(
      c.agg(max(col("c_custkey")).cast("long")).head().getLong(0))
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
    val maxK = manifestMaxLong(s, dir, "k").getOrElse(
      t.agg(max(col("k")).cast("long")).head().getLong(0))
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
    val maxK = manifestMaxLong(s, dir, "k").getOrElse(
      c.agg(max(col("c_custkey")).cast("long")).head().getLong(0))
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
    // needles, each derived deterministically on both engines — ONE
    // aggregation job for both band maxima and ONE lookup job for the
    // three tags (r21: was 2 agg jobs + 3 filter-head jobs, five
    // customer scans for five scalars)
    val maxima = c.agg(
      max(when(bandC && col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0,
        col("c_custkey"))).cast("long"),
      max(when(bandC && col("c_custkey") % 5 === 1, col("c_custkey"))).cast("long")
    ).head()
    val (kRewrote, kIns) = (maxima.getLong(0), maxima.getLong(1))
    val tagRows = c.filter(col("c_custkey").isin(kRewrote, maxK / 2, kIns))
      .select(col("c_custkey").cast("long"),
        md5(col("c_name").cast("binary")).as("t"),
        md5(concat(lit("Z"), col("c_name")).cast("binary")).as("tz"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val needles = Seq(tagRows(kRewrote)._1, tagRows(maxK / 2)._1,
      tagRows(kIns)._2)
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
    val maxK = manifestMaxLong(s, dir, "k").getOrElse(
      t.agg(max(col("k")).cast("long")).head().getLong(0))
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
    "q76_mv_minmax" -> q76_mv_minmax,
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
    // q69's CTEs with min/max added: the source-assisted maintenance
    // (fold counts/sums, recompute affected groups' extremes) must
    // equal the declarative recomputation
    "q76_mv_minmax" ->
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
        |SELECT seg, count(*) AS cnt, sum(round(bal * 100)) / 100 AS sum_bal,
        |  round(min(bal) * 100) / 100 AS min_bal,
        |  round(max(bal) * 100) / 100 AS max_bal
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
