package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.streaming.Trigger

/** Spout flow control (the reference negotiator's pause/throttle
  * levers) + the Kafka spout contract. The Kafka connector jar isn't
  * bundled in this environment, so the broker-facing wiring is locked
  * by inspecting the built reader instead of an embedded round trip.
  */
class BackpressureSpec extends SparkSpecBase {

  private def writeLines(dir: String, files: Seq[String]): Unit =
    files.zipWithIndex.foreach { case (content, i) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, s"f$i.txt"), content + "\n")
    }

  private def topWords(out: String): Map[String, Long] = {
    val last = ExactlyOnceSink.committed(out).max
    spark.read.parquet(graft.streaming.ExactlyOnceSink.batchDir(out, last)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("rate-limited file spout: same totals, drained over more micro-batches") {
    val in = tmpDir("bp-in")
    writeLines(in, Seq("a b a", "b c", "c d a", "d d"))
    def run(limit: RateLimit): (Map[String, Long], Int) = {
      val out = tmpDir("bp-out")
      val ckpt = tmpDir("bp-ckpt")
      val q = WordCountTopology(
        WordCountTopology.fileSpout(in, limit), out, ckpt, topN = 10).run(spark)
      try q.processAllAvailable() finally q.stop()
      (topWords(out), ExactlyOnceSink.committed(out).size)
    }
    val (full, nFull) = run(RateLimit())
    val (throttled, nThrottled) = run(RateLimit.files(1))
    assert(throttled == full, "throttling changed the computed totals")
    assert(nThrottled >= 4, s"expected one micro-batch per file, got $nThrottled")
    assert(nFull <= nThrottled)
  }

  test("AvailableNow trigger: topology drains the backlog and self-terminates") {
    val in = tmpDir("an-in")
    writeLines(in, Seq("x y", "y z"))
    val out = tmpDir("an-out")
    val ckpt = tmpDir("an-ckpt")
    val q = WordCountTopology(
      WordCountTopology.fileSpout(in, RateLimit.files(1)), out, ckpt, topN = 10)
      .withTrigger(Trigger.AvailableNow())
      .run(spark)
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    assert(topWords(out) == Map("x" -> 1L, "y" -> 2L, "z" -> 1L))
  }

  test("kafka spout contract: format, subscription, offsets and admission limit are wired") {
    val reader = graft.sources.Sources.kafkaStream(spark, "broker:9092", "words",
      startingOffsets = "latest", limit = RateLimit.offsets(500))
    val fields = reader.getClass.getDeclaredFields.map { f =>
      f.setAccessible(true); f.get(reader)
    }
    assert(fields.exists(_ == "kafka"), "reader format is not kafka")
    val opts = fields.collectFirst {
      case m: scala.collection.Map[_, _]
        if m.keys.exists(_.toString.equalsIgnoreCase("subscribe")) => m
    }
    assert(opts.isDefined, "no options map with a subscription found on the reader")
    val m = opts.get.map { case (k, v) => k.toString.toLowerCase -> v.toString }
    assert(m("subscribe") == "words")
    assert(m("kafka.bootstrap.servers") == "broker:9092")
    assert(m("startingoffsets") == "latest")
    assert(m("maxoffsetspertrigger") == "500")
  }

  test("kafka spout: only the connector jar is missing, not the wiring") {
    val e = intercept[Exception] {
      graft.sources.Sources.kafkaSpout("broker:9092", "words").open(spark)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected a kafka data-source resolution error, got: ${e.getMessage}")
  }
}
