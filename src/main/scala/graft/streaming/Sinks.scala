package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** Exactly-once output, the reference's central claim (README;
  * Negotiator.hs + SnapshotStore.hs implement it with ZK-coordinated
  * clock-keyed snapshots).
  *
  * Structured Streaming already gives exactly-once state: offsets and
  * state-store versions commit atomically per micro-batch in the
  * checkpoint (the clock+snapshot pair). The remaining seam is the
  * SINK: on recovery a batch may be re-offered. The built-in file
  * sink closes it with its _spark_metadata commit log; for arbitrary
  * sinks the contract is an IDEMPOTENT foreachBatch keyed by batchId
  * — this helper implements that transaction log.
  */
object ExactlyOnceSink {

  private def commitsDir(outDir: String) = Paths.get(outDir, "_commits")

  /** Returns a foreachBatch function writing each micro-batch to
    * `$outDir/batch=<id>` exactly once: a batch already recorded in
    * the commit log is skipped on redelivery, so replays after a
    * crash cannot duplicate output. Commit order: data first, then
    * the marker — a crash between the two re-writes the same batch
    * directory (idempotent overwrite), never double-commits.
    *
    * The log is one marker FILE per batch (`_commits/b<id>`) through
    * the [[graft.operators.CommitStore]] seam — not an append-only
    * line file, because APPEND is the other POSIX-only primitive
    * (object stores have no append, and a torn concurrent append can
    * corrupt every earlier line; one putIfAbsent per batch commits
    * each id at most once even under a zombie replay). Legacy
    * `_committed` line files from pre-r15 sinks are still READ, so an
    * existing output dir resumes where it left off.
    */
  def toDir(outDir: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      Files.createDirectories(Paths.get(outDir))
      if (!committed(outDir).contains(batchId)) {
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        graft.operators.CommitStore.forDir(outDir)
          .putIfAbsent(commitsDir(outDir).resolve(s"b$batchId"),
            Array.emptyByteArray): Unit
      }
    }
  }

  /** Committed batch ids (the sink-side clock): the `_commits/b<id>`
    * markers plus any legacy pre-r15 `_committed` line file.
    */
  def committed(outDir: String): Set[Long] = {
    val markers = graft.operators.CommitStore.forDir(outDir)
      .list(commitsDir(outDir))
      .flatMap(n => if (n.startsWith("b")) n.drop(1).toLongOption else None)
      .toSet
    val legacy = Paths.get(outDir, "_committed")
    val legacyIds =
      if (Files.exists(legacy))
        Files.readAllLines(legacy).asScala.filter(_.nonEmpty)
          .flatMap(_.toLongOption).toSet
      else Set.empty[Long]
    markers ++ legacyIds
  }
}

/** The reference topNBolt as a SINK-side bounded state machine for
  * UPDATE-mode count streams: each micro-batch delivers only the keys
  * whose counts changed (each row carrying its full current total),
  * which are max-merged into a [[TopN]] monoid of size `n` — so
  * per-batch sink work is O(changed keys + n), not a re-sort of the
  * whole vocabulary as in the Complete-mode path.
  *
  * Exactness: update rows carry full totals and totals only grow, so
  * an evicted key re-enters the moment its total beats the current
  * minimum — the same bounded-PSQueue argument as the reference's
  * topNBolt (WordCountSample.hs:118-216). The same monotonicity makes
  * redelivered batches idempotent (max-merge of already-seen totals
  * is a no-op), and recovery restores state from the last committed
  * top file before replay.
  */
final class TopNUpdateSink(outDir: String, n: Int) extends Serializable {
  private val monoid = TopN(n)
  @transient private var state: Map[String, Long] = null
  /** Rows the last batch actually delivered to the driver (after the
    * threshold pushdown) — observability for the bounded-intake spec.
    */
  @transient private[streaming] var lastIntakeRows: Long = -1L

  def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (state == null) state = restore(spark)
    // Threshold pushdown: once the bounded state is FULL, a row can
    // only change the top-N by beating its minimum ELEMENT under the
    // result ordering (cnt desc, word asc) — strictly more count, or
    // equal count and the word tie-break. Every such row has
    // cnt ≥ min, so `cnt >= min` is a conservative SUPERSET filter:
    // exact (the driver-side monoid applies the full ordering to
    // whatever arrives) without comparing strings on the executors,
    // where Spark's UTF8String binary order can disagree with the
    // driver's UTF-16 String order outside the BMP. A refresh of an
    // in-state key always qualifies (totals only grow). Filtered on
    // the EXECUTORS, so driver intake is O(contenders + min-count
    // ties), not O(changed keys) — a backlog replay with a
    // million-key vocabulary delivers only its contenders.
    val pruned =
      if (state.size >= n)
        batch.filter(org.apache.spark.sql.functions.col("cnt") >= state.values.min)
      else batch
    val collected = pruned.collect()
    lastIntakeRows = collected.length.toLong
    val updates = collected.map(r => r.getString(0) -> r.getLong(1)).toMap
    state = monoid.combine(state, updates)
    import spark.implicits._
    val top = state.toSeq.sortBy { case (k, v) => (-v, k) }.toDF("word", "cnt")
    ExactlyOnceSink.toDir(outDir)(top, batchId)
  }

  private def restore(spark: org.apache.spark.sql.SparkSession): Map[String, Long] = {
    val ids = ExactlyOnceSink.committed(outDir)
    if (ids.isEmpty) monoid.empty
    else spark.read.parquet(s"$outDir/batch=${ids.max}")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}

/** Streaming ingest with NEAR-dup admission and index commit — the
  * full ingest-time loop the dedup family builds toward, streamed:
  * each micro-batch of (doc_id, text) documents is gated against the
  * PERSISTED LSH band index ([[graft.dedup.Dedup.buildLshIndex]]'s two
  * bucketed tables), admitted docs are written exactly-once, and the
  * admitted docs' signatures+band keys are COMMITTED BACK to the index
  * so the next batch is gated by this one. [[Bolts.dedupAgainstIndex]]
  * is this loop's exact-fingerprint little sibling (gate only, no
  * commit); this sink closes the write→commit cycle on the
  * approximate path. Like that bolt it holds ZERO stream state — all
  * history lives in the on-disk index, so state-store size is
  * independent of corpus age, and per-batch cost is
  * ∝ batch × band collisions ([[graft.dedup.Dedup.neardupDelta]]'s
  * contract — corpus text is never rescanned).
  *
  * Exactly-once: a TWO-PHASE batch log (`data` then `index` markers
  * per batchId — the clock-keyed snapshot discipline of the
  * reference's Negotiator.hs, applied to a sink with two effects). On replay a
  * batch past `data` skips re-gating (the gate would otherwise see
  * the batch's OWN signatures in the index and drop everything) and
  * resumes at the index phase, re-reading the committed output as the
  * source of truth; a batch past `index` is a no-op. The only
  * post-crash artifact is possible duplicate index rows (append ran,
  * crash before the `index` mark) — harmless to gating: duplicate
  * band/sig rows re-yield the same candidate pairs.
  *
  * Semantics notes (both inherited from the dd04/dd11 design): docs
  * under 3 tokens have no signature — they are admitted unexamined
  * and never indexed; and docs WITHIN one batch are not gated against
  * each other, only against the committed index (an intra-batch
  * near-dup pair lands together, like the reference's bolts, which
  * see one tuple at a time against committed state).
  */
final class NearDupIngestSink(indexTable: String, outDir: String,
                              tau: Double = 0.5) extends Serializable {
  import org.apache.spark.sql.functions.col

  // one marker FILE per (batch, phase) through the CommitStore seam —
  // see ExactlyOnceSink.toDir's rationale (append is POSIX-only);
  // legacy `_phases` line files from pre-r15 sinks are still read
  private def marksDir = Paths.get(outDir, "_phasemarks")
  private def legacyLog = Paths.get(outDir, "_phases")

  private def phases(batchId: Long): Set[String] = {
    // the name must be EXACTLY b<id>-<phase>: PosixCommitStore's
    // crash-staging debris (`b<id>-data.tmp-<nonce>`) would otherwise
    // strip into a phantom "data.tmp-…" phase string — harmless to
    // today's exact contains() checks, a trap for prefix-style ones
    // (ExactlyOnceSink.committed filters the analogous debris)
    val valid = Set("data", "index")
    val marks = graft.operators.CommitStore.forDir(outDir)
      .list(marksDir)
      .collect { case n if n.startsWith(s"b$batchId-") =>
        n.stripPrefix(s"b$batchId-") }
      .filter(valid)
      .toSet
    val legacy =
      if (Files.exists(legacyLog))
        Files.readAllLines(legacyLog).asScala
          .filter(_.startsWith(s"$batchId:")).map(_.split(':')(1)).toSet
      else Set.empty[String]
    marks ++ legacy
  }

  private def mark(batchId: Long, phase: String): Unit =
    graft.operators.CommitStore.forDir(outDir)
      .putIfAbsent(marksDir.resolve(s"b$batchId-$phase"),
        Array.emptyByteArray): Unit

  def apply(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    Files.createDirectories(Paths.get(outDir))
    val done = phases(batchId)
    if (done.contains("index")) return // fully committed — replay no-op
    val dataDir = s"$outDir/batch=$batchId"
    if (!done.contains("data")) {
      val dupes = graft.dedup.Dedup
        .neardupDelta(s, graft.dedup.Dedup.sigsOf(batch), indexTable, tau)
        .select(col("delta_id").as("doc_id")).distinct()
      batch.join(dupes, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(dataDir)
      mark(batchId, "data")
    }
    // index phase reads the COMMITTED output back, never the live
    // batch — so a replay resuming here indexes exactly what phase 1
    // admitted, even if the in-flight batch could re-gate differently
    graft.dedup.Dedup.appendToLshIndex(s, indexTable,
      graft.dedup.Dedup.sigsOf(s.read.parquet(dataDir)))
    mark(batchId, "index")
  }

  /** Committed (fully ingested) batch ids. */
  def committed: Set[Long] = {
    val marks = graft.operators.CommitStore.forDir(outDir)
      .list(marksDir)
      .collect { case n if n.startsWith("b") && n.endsWith("-index") =>
        n.stripPrefix("b").stripSuffix("-index") }
      .flatMap(_.toLongOption).toSet
    val legacy =
      if (Files.exists(legacyLog))
        Files.readAllLines(legacyLog).asScala.collect {
          case l if l.endsWith(":index") => l.split(':')(0).toLong
        }.toSet
      else Set.empty[Long]
    marks ++ legacy
  }
}

object NearDupIngestSink {
  /** Topology-composable form. */
  def sink(indexTable: String, outDir: String, checkpoint: String,
           tau: Double = 0.5): Sink = {
    val s = new NearDupIngestSink(indexTable, outDir, tau)
    Sink("neardup-ingest", (df, trigger) => {
      val w = df.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, batchId: Long) => s(batch, batchId) }
      trigger.foreach(w.trigger)
      w.start()
    })
  }
}
