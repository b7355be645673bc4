package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
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

  /** Returns a foreachBatch function writing each micro-batch to
    * `$outDir/batch=<id>` exactly once: a batch already recorded in
    * the commit log is skipped on redelivery, so replays after a
    * crash cannot duplicate output. Commit order: data first, then
    * the log line — a crash between the two re-writes the same
    * batch directory (idempotent overwrite), never double-commits.
    */
  def toDir(outDir: String): (DataFrame, Long) => Unit = {
    val committedPath = Paths.get(outDir, "_committed")
    (batch: DataFrame, batchId: Long) => {
      Files.createDirectories(Paths.get(outDir))
      val done: Set[Long] =
        if (Files.exists(committedPath))
          Files.readAllLines(committedPath).asScala.filter(_.nonEmpty).map(_.toLong).toSet
        else Set.empty
      if (!done.contains(batchId)) {
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        Files.write(committedPath, s"$batchId\n".getBytes,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    }
  }

  /** Committed batch ids (the sink-side clock). */
  def committed(outDir: String): Set[Long] = {
    val p = Paths.get(outDir, "_committed")
    if (Files.exists(p))
      Files.readAllLines(p).asScala.filter(_.nonEmpty).map(_.toLong).toSet
    else Set.empty
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
