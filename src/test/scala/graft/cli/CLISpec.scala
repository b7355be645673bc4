package graft.cli

import graft.SparkSpecBase
import java.nio.file.{Files, Paths}

class CLISpec extends SparkSpecBase {

  test("run_sample: file -> word-count topology -> top_words.txt (reference CLI flow)") {
    val in = Files.createTempDirectory("cli-in")
    Files.write(in.resolve("sample.txt"),
      "hotel bravo\nhotel alpha\nhotel bravo\n".getBytes)
    val out = tmpDir("cli-out")
    GraftCLI.runSample(spark, in.resolve("sample.txt").toString, out)
    val lines = Files.readAllLines(Paths.get(out, "top_words.txt"))
    assert(lines.get(0) == "hotel,3")
    assert(lines.contains("bravo,2"))
    assert(lines.contains("alpha,1"))
  }

  test("emit: rate-spout load run reports a measured result") {
    // session-scoped variant of the `emit` verb (run_sample_emitter
    // analog): must produce at least one data-carrying batch and a
    // positive sustained rate
    val r = graft.streaming.ThroughputHarness.run(
      spark, update = true, targetRps = 20000, minBatches = 2, timeoutMs = 30000)
    assert(r.batches >= 2 && r.rows > 0 && r.sustainedRps > 0, r.json)
    assert(r.json.contains("\"mode\":\"update\""))
  }

  test("run_sample --update: bounded-state top-N path writes the same file") {
    val in = Files.createTempDirectory("cli-in-u")
    Files.write(in.resolve("sample.txt"),
      "hotel bravo\nhotel alpha\nhotel bravo\n".getBytes)
    val out = tmpDir("cli-out-u")
    GraftCLI.runSample(spark, in.resolve("sample.txt").toString, out, update = true)
    val lines = Files.readAllLines(Paths.get(out, "top_words.txt"))
    assert(lines.get(0) == "hotel,3")
    assert(lines.contains("bravo,2"))
    assert(lines.contains("alpha,1"))
  }
}
