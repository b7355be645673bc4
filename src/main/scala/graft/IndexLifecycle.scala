package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The ONE register / evict / evict-all lifecycle behind every
  * session-scoped build-once artifact: the dd02/dd04 cached pair
  * sets, the dd10 fingerprint index table, the dd11 LSH index
  * tables, the ann02/ann06 persisted IVF directory, and the ann05 PQ
  * codebooks. The five families previously hand-rolled the same
  * memo-and-evict pattern with subtle differences (catalog
  * revalidation in two, file cleanup in three); this class carries
  * the superset behavior for all of them:
  *
  *  - `getOrBuild` memoizes per (session, key), re-`validate`-ing a
  *    hit before trusting it — a table another session dropped from
  *    the shared catalog, or an index dir deleted out from under the
  *    memo, triggers a rebuild instead of a downstream read error.
  *  - `evict` releases one artifact (unpersist / DROP TABLE + files /
  *    delete dir — whatever `release` says) and drops the entry.
  *  - `evictAll(session)` sweeps every artifact of every lifecycle —
  *    the hygiene hook for long-lived sessions iterating many corpus
  *    dirs.
  *
  * NOTE the WeakHashMap key cannot actually be reclaimed while a
  * memoized DataFrame value references its session (the classic
  * WeakHashMap self-pin) — manual evict[All] is the lifecycle
  * contract for long-lived processes, not GC.
  */
final class IndexLifecycle[V](
    val name: String,
    validate: (SparkSession, V) => Boolean = (_: SparkSession, _: V) => true,
    release: (SparkSession, V) => Unit = (_: SparkSession, _: V) => ()) {

  private val memo =
    new java.util.WeakHashMap[SparkSession, collection.mutable.Map[String, V]]()

  IndexLifecycle.register(this)

  /** Memo hit (if still valid) or build-under-lock. A stale hit gets
    * a best-effort `release` before the rebuild: an artifact can be
    * PARTIALLY invalidated (one of the LSH tables dropped, an index
    * dir's centroids deleted but its corpus-sized vectors left
    * behind) — without the release those survivors would leak with no
    * remaining reference, since the rebuild lands at a fresh
    * location. A fully-gone artifact makes the release a cheap no-op
    * (DROP IF EXISTS / delete of a missing dir), so the sweep is
    * always safe; failures are swallowed because the rebuild, not the
    * cleanup, is what the caller asked for.
    */
  def getOrBuild(s: SparkSession, key: String)(build: => V): V = synchronized {
    val m = memo.computeIfAbsent(s, _ => collection.mutable.Map.empty[String, V])
    m.get(key).filter(v => validate(s, v)) match {
      case Some(v) => v
      case None =>
        m.remove(key).foreach(v => scala.util.Try(release(s, v)))
        val v = build
        m(key) = v
        v
    }
  }

  /** Release one (session, key) artifact. Returns whether an entry
    * existed.
    */
  def evict(s: SparkSession, key: String): Boolean = synchronized {
    Option(memo.get(s)).flatMap(_.remove(key)) match {
      case Some(v) => release(s, v); true
      case None => false
    }
  }

  /** Release every artifact this lifecycle holds for a session;
    * returns how many were released.
    */
  def evictAll(s: SparkSession): Int = synchronized {
    Option(memo.get(s)).map { m =>
      val n = m.size
      m.valuesIterator.foreach(release(s, _))
      m.clear()
      n
    }.getOrElse(0)
  }

  /** The keys currently registered for a session (spec observability). */
  def registered(s: SparkSession): Set[String] = synchronized {
    Option(memo.get(s)).map(_.keySet.toSet).getOrElse(Set.empty)
  }
}

object IndexLifecycle {
  private val lifecycles = collection.mutable.Buffer[IndexLifecycle[_]]()

  private def register(l: IndexLifecycle[_]): Unit =
    lifecycles.synchronized { lifecycles += l }

  /** All lifecycles constructed so far (spec observability). */
  def all: Seq[IndexLifecycle[_]] = lifecycles.synchronized { lifecycles.toSeq }

  /** Drop every session-scoped artifact of every lifecycle — caches,
    * catalog tables, index files. Returns how many artifacts were
    * released.
    */
  def evictAll(s: SparkSession): Int = all.map(_.evictAll(s)).sum

  /** Delete a local directory tree (shared by index builders' failure
    * cleanup and their `release` hooks).
    */
  def deleteRecursively(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Path.of(path)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      val paths =
        try walk.iterator().asScala.toSeq
        finally walk.close()
      paths.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Drop a catalog table and its backing files (file: scheme only) —
    * the shared cleanup for every table-backed index (the fp index;
    * the LSH index is dir-based since its MergeTable migration and
    * needs only [[deleteRecursively]]). Deletes ONLY the table's own
    * location, never its parent.
    */
  def dropTableWithFiles(s: SparkSession, table: String): Unit = {
    val loc = scala.util.Try(
      s.sql(s"DESCRIBE TABLE EXTENDED $table").filter(col("col_name") === "Location")
        .head().getString(1)).toOption
    s.sql(s"DROP TABLE IF EXISTS $table")
    loc.filter(_.startsWith("file:")).foreach(l =>
      deleteRecursively(java.nio.file.Path.of(java.net.URI.create(l)).toString))
  }
}
