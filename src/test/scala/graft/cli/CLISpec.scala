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
