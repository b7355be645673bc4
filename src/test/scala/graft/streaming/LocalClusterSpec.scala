package graft.streaming

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Drives [[LocalClusterSmoke]] in a child JVM: the one place the
  * suite leaves `local[n]` and runs the checkpointed topology across
  * REAL executor processes (`local-cluster[2,1,2048]`). Green where
  * the Spark distribution can fork workers; cleanly CANCELED (never
  * failed) where it can't — no Spark distribution, explicit opt-out
  * via SPARK_GRAFT_SKIP_LOCAL_CLUSTER=1, or an environment where the
  * workers don't come up.
  */
class LocalClusterSpec extends AnyFunSuite {

  private val addOpens: Seq[String] =
    (Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")) ++
      Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar")
        .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")

  test("checkpointed word-count topology runs on multi-process executors") {
    assume(!sys.env.contains("SPARK_GRAFT_SKIP_LOCAL_CLUSTER"),
      "skipped via SPARK_GRAFT_SKIP_LOCAL_CLUSTER")
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(Files.isDirectory(Path.of(sparkHome, "sbin")),
      s"no Spark distribution at $sparkHome — local-cluster cannot fork workers")
    val classes = Path.of("target", "scala-2.13", "classes").toAbsolutePath
    assume(Files.isDirectory(classes), "compiled classes dir missing")
    val javaBin = Path.of(sys.props("java.home"), "bin", "java").toString
    val log = Files.createTempFile("lc-smoke", ".log").toFile

    val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", s"$classes:$sparkHome/jars/*", "graft.streaming.LocalClusterSmoke")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", sparkHome)
    // a binary distribution has no launcher/target build dirs; the
    // worker's executor command builder needs the scala version told
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    val p = pb.start()
    val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) p.destroyForcibly().waitFor()
    val out = new String(Files.readAllBytes(log.toPath))
    def tail = out.linesIterator.toSeq.takeRight(25).mkString("\n")
    assume(done, s"local-cluster smoke timed out (environment too slow): $tail")
    if (out.contains("SMOKE SKIP"))
      cancel(out.linesIterator.find(_.contains("SMOKE SKIP")).getOrElse("skipped"))
    assert(p.exitValue() == 0 && out.contains("SMOKE OK"),
      s"local-cluster smoke failed (rc ${p.exitValue()}):\n$tail")
  }
}
