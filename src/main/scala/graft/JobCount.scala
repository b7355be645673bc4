package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Plan-audit main beside [[Explain]]: runs the named queries through
  * the noop sink and prints PER QUERY how many Spark jobs and tasks
  * the full operator path launched (fixture builds + commits + the
  * final read — everything the bench times). The control-plane
  * optimization evidence `explain` cannot show: a commit path that
  * stopped re-scanning its output shows up here as fewer jobs/tasks
  * with identical results. Usage: JobCount <sfDir> <query> [query...]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    // per-job wall + call site, for the optional -v breakdown
    val verbose = sys.env.get("SPARK_GRAFT_JOBCOUNT_VERBOSE").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = starts.remove(je.jobId)
        if (st != null && verbose) lines.add(
          f"  job ${je.jobId}%3d ${(System.nanoTime() - st._1) / 1e9}%6.2fs ${st._2}")
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    def runOnce(name: String): (Long, Long, Double) = {
      val (j0, t0) = (jobs.get(), tasks.get())
      val t = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // listener delivery is async; a short quiesce keeps the per-query
      // deltas attributable (±0 jobs matters here, exact tasks don't)
      Thread.sleep(300)
      (jobs.get() - j0, tasks.get() - t0, (System.nanoTime() - t) / 1e9)
    }
    // warm pass absorbs codegen/JIT; the reported pass is the steady
    // shape (fixture dirs are per-(process, session): rebuilt per run)
    names.foreach(runOnce)
    operators.MergeTable.cleanupFixtures()
    names.foreach { n =>
      lines.clear()
      val (j, t, secs) = runOnce(n)
      println(f"jobcount $n jobs=$j tasks=$t secs=$secs%.2f")
      lines.forEach(println(_))
    }
    operators.MergeTable.cleanupFixtures()
    spark.stop()
  }
}
