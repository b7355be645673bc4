package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._
import graft.operators.MergeTable

/** A [[MergeTable]] change feed as a Structured Streaming SOURCE —
  * the consumption half of the CDC story (reference surface: the
  * input-source contract, `src/Hailstorm/InputSource.hs:1-40`,
  * generalized to table deltas): every committed generation becomes
  * a micro-batch of net logical changes, so downstream graft
  * topologies (dedup gates, index appends, replicas) ride ordinary
  * `readStream` plans with checkpointed exactly-once delivery.
  *
  * Built on the v1 `Source` seam — the same internal-but-stable API
  * Delta Lake's DeltaSource rides — because its `getBatch` returns a
  * full DataFrame: the batch IS [[MergeTable.changesBetween]]'s
  * manifest-pruned diff plan (opens only files that differ between
  * the two generations), executed distributed like any batch query.
  * A DSv2 MicroBatchStream would force per-partition row production
  * and give up that join plan.
  *
  * Offsets are generation numbers (LongOffset). Determinism &
  * exactly-once: `changesBetween(a, b)` is a pure function of the
  * two manifests, so replaying a checkpointed range after a crash
  * reproduces the identical batch — provided generations at or above
  * the stream's checkpoint horizon haven't been vacuumed (Delta's
  * exact retention contract for streaming reads; see
  * [[MergeTable.vacuum]]).
  *
  * No per-generation admission control, deliberately: a generation
  * is one COMMIT, its delta sized by the files that commit rewrote —
  * the natural batch unit. A stream resuming after downtime gets one
  * catch-up batch spanning the missed generations, which is the NET
  * diff of the span (cheaper than replaying each generation).
  *
  * Options: `path` (table dir), `keyCol`, `startGen` (baseline
  * generation, default 0: the stream emits changes AFTER it — or
  * `snapshot` for snapshot-then-follow: the FIRST batch is the whole
  * table as `I` rows at the then-committed generation, and deltas
  * follow from there; Delta's startingVersion-less stream shape),
  * `preImages` (default false; true = Delta-CDF update shape — each
  * U key arrives as `U_pre` + `U_post` rows, what a delta-maintained
  * view needs to retract-then-assert; see
  * [[MergeTable.changesBetween]]).
  *
  * Output schema: keyCol, change_op (I/U/D), _commit_gen (the
  * batch's end generation), then the table's value columns — post-
  * image for I/U, pre-image for D. Fixed at stream start from the
  * committed log schema; a mid-stream schema evolution surfaces new
  * columns only after restart (Delta's posture).
  */
final class CdcSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val (dir, keyCol, _, _) = CdcSource.options(parameters)
    (shortName(), CdcSource.cdcSchema(dir, keyCol))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val (dir, keyCol, rawStart, preImages) = CdcSource.options(parameters)
    // a typo'd baseline would otherwise yield a silently-empty stream
    val cur = MergeTable.committedGen(dir).getOrElse(
      throw new IllegalArgumentException(s"$dir is not a committed keyed table"))
    // `latest` resolves ONCE, at stream creation: follow-only from the
    // then-committed generation (Delta's startingVersion=latest)
    val startGen = if (rawStart == CdcSource.Latest) cur else rawStart
    require(startGen >= -1 && startGen <= cur,
      s"startGen $startGen out of range: table $dir is at generation $cur " +
        "(use -1 / 'snapshot' for snapshot-then-follow, 'latest' for follow-only)")
    // retention handshake: register this stream's horizon (keyed by
    // its checkpoint identity, so a restart re-claims the same entry)
    // BEFORE the first batch — MergeTable.vacuum refuses to sweep
    // generations a registered consumer could still replay. Floor
    // semantics: a restart must not regress a horizon getBatch/commit
    // already advanced. The horizon rises to each in-flight span's
    // START in getBatch and to the span's END once the engine calls
    // Source.commit for it — which the microbatch engine does while
    // constructing the NEXT batch, so a live stream's horizon always
    // trails the newest span: that span's replay is genuinely still
    // possible, and a vacuum then would genuinely strand it (the
    // refusal is honest conservatism, not slack). Decommissioning is
    // MergeTable.releaseCdcHorizon / `table cdc-release`.
    val consumer = CdcSource.consumerId(metadataPath)
    // INITIAL registration only: once an entry exists, horizon
    // advancement belongs to getBatch/commit (floor semantics — they
    // know the actually-replayable spans). A RESTART must never raise
    // it here: the engine WALs a batch's offsets BEFORE executing it,
    // so a crash between WAL and batch-commit replays the old span
    // after restart — and snapshot/latest re-resolve against the NEW
    // current generation in this method, so raising the surviving
    // entry would let vacuum sweep exactly the manifests that
    // mandatory replay still reads. First attach is safe by engine
    // ordering (createSource runs before the first offset is logged,
    // so no replayable span exists yet): a delta baseline registers
    // its explicit start, snapshot/latest register the attach-time
    // head — which is what keeps an idle table's vacuum unblocked
    // instead of pinning a horizon at 0 forever.
    CdcSource.registerInitial(dir, consumer,
      if (startGen < 0) cur else startGen)
    new CdcSource(ctx, dir, keyCol, startGen, preImages, consumer)
  }
}

object CdcSource {
  /** Sentinel for `startGen=latest` (resolved to the then-committed
    * generation at stream creation, not per batch).
    */
  private[sources] val Latest = -2

  /** Stable per-stream consumer id for the horizon registry: the
    * stream's checkpoint metadata path IS its identity (restarts
    * share it, distinct queries don't), hashed to a filename-safe
    * token. Full 128-bit MD5, not a 32-bit word: two streams on one
    * table sharing a horizon file by hash collision would let the
    * caught-up one overwrite the laggard's registration — the exact
    * silent stranding the registry exists to prevent.
    */
  private[sources] def consumerId(metadataPath: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(metadataPath.getBytes("UTF-8"))
    "stream-" + d.map(b => f"$b%02x").mkString
  }

  /** Register `gen` as the consumer's horizon UNLESS a higher one is
    * already recorded — getBatch/commit replay old spans after a
    * restart, and snapping an advanced horizon back down would block
    * vacuum forever on an idle-but-caught-up stream.
    */
  private[sources] def registerFloor(dir: String, consumer: String, gen: Int): Unit =
    if (!MergeTable.cdcHorizons(dir).get(consumer).exists(_ >= gen))
      MergeTable.registerCdcHorizon(dir, consumer, gen)

  /** Register `gen` only when the consumer has NO entry yet — the
    * createSource-time registration (see the call site for why a
    * restart must never raise an existing entry from there).
    */
  private[sources] def registerInitial(dir: String, consumer: String, gen: Int): Unit =
    if (!MergeTable.cdcHorizons(dir).contains(consumer))
      MergeTable.registerCdcHorizon(dir, consumer, gen)

  /** `startGen = -1` is the internal encoding of `snapshot`,
    * [[Latest]] of `latest`.
    */
  private[sources] def options(p: Map[String, String]): (String, String, Int, Boolean) = {
    val dir = p.getOrElse("path",
      throw new IllegalArgumentException("graft-cdc requires option 'path' (MergeTable dir)"))
    val keyCol = p.getOrElse("keycol", p.getOrElse("keyCol",
      throw new IllegalArgumentException("graft-cdc requires option 'keyCol'")))
    val sg = p.getOrElse("startgen", p.getOrElse("startGen", "0"))
    val gen =
      if (sg.equalsIgnoreCase("snapshot")) -1
      else if (sg.equalsIgnoreCase("latest")) Latest
      else sg.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"graft-cdc option 'startGen' must be an integer generation, 'snapshot', or 'latest', got '$sg'"))
    val pi = p.getOrElse("preimages", p.getOrElse("preImages", "false"))
    val preImages = pi.toBooleanOption.getOrElse(throw new IllegalArgumentException(
      s"graft-cdc option 'preImages' must be true/false, got '$pi'"))
    (dir, keyCol, gen, preImages)
  }

  /** keyCol, change_op, _commit_gen, then value columns in log-schema
    * order — fixed at stream definition from the committed log.
    */
  private[sources] def cdcSchema(dir: String, keyCol: String): StructType = {
    val gen = MergeTable.committedGen(dir).getOrElse(throw new IllegalArgumentException(
      s"$dir is not a committed keyed table (no commit log)"))
    val tbl = MergeTable.schemaAt(dir, gen).getOrElse(throw new IllegalArgumentException(
      s"$dir generation $gen records no schema in its commit log"))
    require(tbl.fieldNames.contains(keyCol),
      s"keyCol '$keyCol' not in table schema ${tbl.fieldNames.mkString("[", ",", "]")}")
    StructType(
      tbl.fields.filter(_.name == keyCol) ++
        Seq(StructField("change_op", StringType, nullable = false),
          StructField("_commit_gen", LongType, nullable = false)) ++
        // value columns are ALWAYS nullable in a change feed: a later
        // schema evolution can insert rows that omit a column the
        // stream's fixed schema declared non-nullable (and carried
        // pre-evolution files surface added columns as null)
        tbl.fields.filterNot(_.name == keyCol).map(_.copy(nullable = true)))
  }
}

final class CdcSource(ctx: SQLContext, dir: String, keyCol: String, startGen: Int,
                      preImages: Boolean = false, consumer: String = "")
    extends Source {
  private val spark = ctx.sparkSession

  override val schema: StructType = CdcSource.cdcSchema(dir, keyCol)

  private def genOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().toLong
  }

  /** Latest committed generation — one checkpoint-pointer read plus
    * a short tail probe (no listing, no Spark job), so an idle
    * stream's per-trigger poll stays flat at any commit depth;
    * monotone because the commit log only grows (vacuum never lowers
    * the committed marker).
    */
  override def getOffset: Option[Offset] =
    MergeTable.committedGen(dir).filter(_ > startGen).map(g => LongOffset(g.toLong))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(genOf).getOrElse(startGen.toLong)
    val to = genOf(end)
    // generations are Int on the MergeTable side; a 2^31st commit is
    // practically unreachable but must fail loudly, not wrap in the
    // .toInt below and replay the wrong span
    require(from <= Int.MaxValue && to <= Int.MaxValue,
      s"generation span [$from, $to] exceeds Int range — " +
        "MergeTable generations are Int-bounded")
    // advance the retention horizon to the oldest generation a replay
    // of THIS OR A LATER batch could need: the span's start for a
    // delta batch, its end for the snapshot bootstrap (which reads
    // asOf(to) and whose successor spans start at to). Floor, never
    // overwrite: a replayed old span after restart must not regress
    // what a later commit() already advanced.
    if (consumer.nonEmpty)
      CdcSource.registerFloor(dir, consumer,
        if (from < 0) to.toInt else from.toInt)
    // snapshot bootstrap: the first batch is the whole table AS OF
    // the end generation, every row an insert — deterministic on
    // replay for the same reason deltas are (a pure function of that
    // generation's manifest)
    val delta =
      if (from < 0)
        MergeTable.readTable(spark, dir, asOf = Some(to.toInt))
          .withColumn("change_op", lit("I"))
          .withColumn("_commit_gen", lit(to))
      else
        MergeTable.changesBetween(spark, dir, from.toInt, to.toInt, keyCol, preImages)
          .withColumn("_commit_gen", lit(to))
    // align to the declared schema: the span's union columns may
    // predate/postdate the stream's fixed schema — declared-but-
    // missing surfaces as null, undeclared is dropped
    val aligned = delta.select(schema.fieldNames.toIndexedSeq.map(n =>
      if (delta.columns.contains(n)) col(n)
      else lit(null).cast(schema(n).dataType).as(n)): _*)
    // getBatch's contract wants an isStreaming plan; wrap the planned
    // batch query's RDD the way v1 sources do (LogicalRDD with
    // isStreaming = true) — the diff still executes distributed, the
    // plan is just opaque to the streaming planner
    org.apache.spark.sql.graft.StreamingShim.asStreaming(aligned)
  }

  /** The engine durably committed everything through `end`: no replay
    * will ever ask for a span starting below it, so the retention
    * horizon advances to `end` itself. The microbatch engine calls
    * this while constructing the batch AFTER the one it commits, so
    * the horizon of a live stream trails the newest delivered span —
    * correctly: until this hook fires for a span, its replay is
    * possible and vacuum must not sweep what the replay would read.
    * Without this hook the horizon would trail by a FULL extra span
    * (getBatch only pins span starts).
    */
  override def commit(end: Offset): Unit =
    if (consumer.nonEmpty) {
      val to = genOf(end)
      if (to >= 0 && to <= Int.MaxValue)
        CdcSource.registerFloor(dir, consumer, to.toInt)
    }

  override def stop(): Unit = ()
}
