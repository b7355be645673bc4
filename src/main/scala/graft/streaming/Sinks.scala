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
