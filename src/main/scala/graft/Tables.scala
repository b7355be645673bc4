package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the TPC-H-ish star schema + events /
  * documents / embeddings (see TESTDATA.md).
  *
  * All operators read through here so scans stay uniform: callers
  * `.select(...)` the columns they need, letting Parquet column
  * pruning and predicate pushdown reach the scan (verified via
  * `.explain("formatted")` — ReadSchema / PushedFilters).
  */
object Tables {
  // Memoized per (session, path): repeated loads of the same table
  // reuse one analyzed relation (and its file listing / footer
  // schema), which matters when a 45-query batch reads the same 10
  // tables — the DataFrame is immutable so sharing is safe.
  private val cache =
    new java.util.WeakHashMap[SparkSession, collection.mutable.Map[String, DataFrame]]()

  private def memo(s: SparkSession, key: String)(mk: => DataFrame): DataFrame =
    cache.synchronized {
      val m = cache.computeIfAbsent(s, _ => collection.mutable.Map.empty)
      m.getOrElseUpdate(key, mk)
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memo(spark, s"$dir/$name")(spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (which
    * Spark 4 refuses to read natively), as naive TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ), and could ship UTC-adjusted. Adapt to
    * whatever the file carries and normalize to a session-TZ (UTC)
    * `timestamp` so every downstream query and the DuckDB oracle
    * (whose TIMESTAMP is naive µs) see identical instants.
    */
  def events(s: SparkSession, d: String): DataFrame = memo(s, s"$d/events") {
    normalizeEventsTs(loadEventsRaw(s, s"$d/events.parquet"))
  }

  /** Read the events parquet, tolerating TIMESTAMP(NANOS) via the
    * legacy nanos-as-long switch (harmless for µs/ms files).
    */
  private def loadEventsRaw(s: SparkSession, path: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path)
  }

  /** Normalize whatever type `ts` arrived as to session-TZ timestamp. */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long: truncate ns → µs like DuckDB does
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => // naive µs: session TZ is UTC, value-preserving
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df // already session-TZ timestamp
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** `events` as an unbounded stream (same schema/semantics as the
    * batch loader): the file spout over the events table.
    */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Probe the file's actual on-disk schema via a batch read (footer
    // only), then declare exactly that to the stream source and apply
    // the same ts normalization as the batch loader.
    val raw = loadEventsRaw(s, s"$d/events.parquet").schema
    // the file-stream source needs a directory; stage the table file
    // into one (symlink — no data copy)
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    val link = dir.resolve("events.parquet")
    // the staged dir must outlive the returned stream (its file index
    // lists lazily), so reclamation is JVM-exit: register dir THEN
    // link — deleteOnExit unwinds in reverse registration order, and
    // an empty-dir delete only succeeds after its child went
    dir.toFile.deleteOnExit()
    link.toFile.deleteOnExit()
    try java.nio.file.Files.createSymbolicLink(
      link, java.nio.file.Paths.get(s"$d/events.parquet"))
    catch { case _: UnsupportedOperationException =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$d/events.parquet"), link)
    }
    normalizeEventsTs(s.readStream.schema(raw).parquet(dir.toString))
  }
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
