package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Multi-process smoke of the checkpointed word-count topology — the
  * analog of the reference's process-forking runner
  * (`src/Hailstorm/Runner.hs:38-68`: spouts/bolts as OS processes
  * coordinated via ZooKeeper). graft's mapping puts process placement
  * on the Spark cluster manager and coordination state in the
  * checkpoint, and everything else in the suite runs `local[n]` — one
  * JVM, in-process executors, where a closure-serialization or
  * task-locality bug can hide. `local-cluster[2,1,2048]` forks TWO
  * real worker JVMs with separate executor processes, so the topology
  * crosses genuine process boundaries (task serialization, shuffle
  * over the block transfer service, checkpoint commits visible across
  * processes) the way a 1000-executor cluster would run it.
  *
  * Run as its OWN process (LocalClusterSpec spawns it): a JVM admits
  * one SparkContext, and the suite's shared `local[n]` session must
  * not be torn down under the other suites. Prints `SMOKE OK` on
  * success; `SMOKE SKIP: <reason>` (exit 0) when the cluster master
  * cannot launch in this environment — the spec maps that to a
  * cancel, not a failure.
  */
object LocalClusterSmoke {
  def main(args: Array[String]): Unit = {
    val spark =
      try {
        val s = SparkSession.builder()
          .master("local-cluster[2,1,2048]")
          .appName("graft-local-cluster-smoke")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.ui.enabled", "false")
          .config("spark.executor.memory", "1g")
          // worker JVMs launch bare from SPARK_HOME: they need the
          // graft classes this process was started with
          .config("spark.executor.extraClassPath", sys.props("java.class.path"))
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        // prove executors actually registered (a job would also block,
        // but fail fast + loud if the workers never came up)
        val deadline = System.currentTimeMillis() + 120000
        while (s.sparkContext.statusTracker.getExecutorInfos.length < 3 &&
               System.currentTimeMillis() < deadline)
          Thread.sleep(500)
        if (s.sparkContext.statusTracker.getExecutorInfos.length < 3) {
          println("SMOKE SKIP: executors did not register within 120s")
          s.stop()
          return
        }
        s
      } catch {
        case e: Throwable =>
          println(s"SMOKE SKIP: cannot launch local-cluster master: $e")
          return
      }
    try {
      val in = Files.createTempDirectory("lc-smoke-in")
      Files.write(in.resolve("sample.txt"),
        "hotel bravo\nhotel alpha\nhotel bravo\n".getBytes)
      val out = Files.createTempDirectory("lc-smoke-out").toString
      graft.cli.GraftCLI.runSample(spark, in.resolve("sample.txt").toString, out)
      val lines = Files.readAllLines(java.nio.file.Path.of(out, "top_words.txt"))
      require(lines.get(0) == "hotel,3" && lines.contains("bravo,2") &&
        lines.contains("alpha,1"), s"wrong topology output: $lines")
      println("SMOKE OK")
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        println(s"SMOKE FAIL: $e")
        sys.exit(1)
    } finally spark.stop()
  }
}
