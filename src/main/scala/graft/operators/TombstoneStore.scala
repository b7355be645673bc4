package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE implementation of the takedown-tombstone registry both
  * index families ride (LSH posting store: doc_id; IVF vector index:
  * vec_id) — extracted in r20 after the two hand-copies diverged:
  * the racing-clear hardenings (ignoreMissingFiles reads, the debris
  * sweep sparing another writer's private staging file) had landed on
  * the Dedup copy and not the Similarity one. Layout and lifecycle:
  *
  *  - the set is tiny append-only parquet under `<root>/tombstones`
  *    (the index is dir-based, so its governance state is too);
  *  - each registration stages writer-privately
  *    (`.takedown-<token>.staging`) and publishes ONE token-named
  *    file with an atomic same-dir move — concurrent registrations
  *    never share a Spark output dir, a reader never sees a torn
  *    file, and an empty batch writes nothing (a zero-row part file
  *    would make every governed probe pay the anti-join forever);
  *  - reads tolerate a racing vacuum's clear (ignoreMissingFiles):
  *    files deleted between listing and execution read as the
  *    post-clear set — wrong-failure eliminated, never wrong-result;
  *  - the clear is FILE-PRECISE: a vacuum pass deletes exactly the
  *    part files it snapshotted, so a takedown registered mid-vacuum
  *    survives, keeps governing probes, and is processed by the next
  *    pass; the final debris sweep (committer _SUCCESS/crc files)
  *    spares `.takedown-*.staging` (another writer's in-flight
  *    registration — sweeping it would crash that ATOMIC_MOVE) and
  *    removes the dir only when truly empty.
  *
  * The family-specific halves — WHAT a vacuum rewrites and how the
  * clear is fenced against racing appends — stay with the families
  * (Dedup.vacuumLshTombstones, Similarity.vacuumVectorTombstones).
  */
object TombstoneStore {
  import java.nio.file.{Files, Path, StandardCopyOption}
  import scala.jdk.CollectionConverters._

  def dirOf(root: String): String = s"$root/tombstones"

  /** Any published tombstones? (One dir listing, the probe gate.) */
  def has(root: String): Boolean = {
    val p = Path.of(dirOf(root))
    Files.isDirectory(p) && {
      val ls = Files.list(p)
      try ls.anyMatch(_.getFileName.toString.endsWith(".parquet"))
      finally ls.close()
    }
  }

  /** Register `ids` (cast to long, distinct; empty batch = no-op). */
  def register(s: SparkSession, root: String, ids0: DataFrame,
               idCol: String): Unit = {
    val ids = ids0.select(col(idCol).cast("long")).distinct().localCheckpoint()
    if (ids.isEmpty) return
    val stage = Files.createTempDirectory("graft-tomb")
    try {
      ids.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val ls = Files.list(stage)
      val part = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"staged takedown lost its part file: $stage"))
      finally ls.close()
      val dest = Path.of(dirOf(root))
      Files.createDirectories(dest)
      val token = WriterToken.next()
      val tmp = dest.resolve(s".takedown-$token.staging")
      Files.copy(part, tmp)
      Files.move(tmp, dest.resolve(s"takedown-$token.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      ()
    } finally graft.IndexLifecycle.deleteRecursively(stage.toString)
  }

  /** The current set as one `idCol` column (empty frame when none). */
  def read(s: SparkSession, root: String, idCol: String): DataFrame =
    if (has(root))
      s.read.option("ignoreMissingFiles", "true")
        .parquet(dirOf(root)).distinct().toDF(idCol)
    else s.range(0).select(col("id").as(idCol))

  /** The part files a vacuum pass OWNS (and will clear). */
  def snapshot(root: String): IndexedSeq[Path] = {
    val p = Path.of(dirOf(root))
    if (!Files.isDirectory(p)) return IndexedSeq.empty
    val ls = Files.list(p)
    try ls.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toIndexedSeq
    finally ls.close()
  }

  /** A snapshot's rows (ignoreMissingFiles — see the object doc). */
  def readSnapshot(s: SparkSession, files: Seq[Path]): DataFrame =
    s.read.option("ignoreMissingFiles", "true")
      .parquet(files.map(_.toString): _*).distinct()

  /** Delete exactly `files` (+ their crc siblings); when that empties
    * the published set, sweep committer debris — SPARING another
    * writer's `.takedown-*.staging` — and rmdir if truly empty.
    */
  def clearSnapshot(root: String, files: Seq[Path]): Unit = {
    files.foreach { f =>
      Files.deleteIfExists(f)
      Files.deleteIfExists(f.resolveSibling("." + f.getFileName + ".crc"))
      ()
    }
    if (!has(root)) {
      val p = Path.of(dirOf(root))
      if (Files.isDirectory(p)) {
        val ls = Files.list(p)
        try ls.iterator().asScala
          .filter { e =>
            val name = e.getFileName.toString
            Files.isRegularFile(e) && !name.endsWith(".parquet") &&
              !(name.startsWith(".takedown-") && name.endsWith(".staging"))
          }
          .foreach(Files.deleteIfExists(_))
        finally ls.close()
        scala.util.Try(Files.delete(p)) // rmdir: only when truly empty
        ()
      }
    }
  }
}
