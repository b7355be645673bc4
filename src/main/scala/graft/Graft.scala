package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Library front door for users switching from the reference engine.
  *
  * {{{
  * val spark = Graft.session()              // tuned local session
  * Graft.registerViews(spark, dataDir)      // tables as SQL views
  * spark.sql("SELECT ... FROM lineitem ...")
  * Graft.query("q04_agg")(spark, dataDir)   // any §2 operator
  * }}}
  */
object Graft {
  /** Opinionated session: UTC, AQE (with skew-join handling) on,
    * graft_* SQL functions registered. `shufflePartitions` should
    * track cluster cores (driver env on local mode).
    */
  def session(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    functions.GraftExtensions.register(s)
    s
  }

  /** Register every table in `dir` as a SQL temp view. */
  def registerViews(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(s, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(s, dir).createOrReplaceTempView("events")
  }

  /** Look up any §2 operator by its inventory key. */
  def query(name: String): (SparkSession, String) => DataFrame =
    SparkEntry.queries(name)
}
