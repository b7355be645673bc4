package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Update-mode top-N (bounded sink state) vs the Complete-mode
  * re-sort path: identical results, O(changed keys + N) sink work.
  */
class TopNUpdateSpec extends SparkSpecBase {
  import spark.implicits._

  private def lastTop(out: String): List[(String, Long)] = {
    val last = ExactlyOnceSink.committed(out).max
    spark.read.parquet(ExactlyOnceSink.batchDir(out, last))
      .orderBy(col("cnt").desc, col("word"))
      .as[(String, Long)].collect().toList
  }

  test("update-mode top-N matches the Complete-mode topology batch for batch") {
    implicit val sql = spark.sqlContext
    val memA = MemoryStream[String]
    val memB = MemoryStream[String]
    val (outA, ckptA) = (tmpDir("tc-out"), tmpDir("tc-ckpt"))
    val (outB, ckptB) = (tmpDir("tu-out"), tmpDir("tu-ckpt"))
    val qA = WordCountTopology(
      Spout("memA", _ => memA.toDF()), outA, ckptA, topN = 3).run(spark)
    val qB = WordCountTopology.updateMode(
      Spout("memB", _ => memB.toDF()), outB, ckptB, topN = 3).run(spark)
    try {
      val batches = Seq(
        Seq("the cat and the hat", "the bat"),
        Seq("the cat again"),
        // bat overtakes cat AFTER having been evicted from a top-3
        // bounded state — the re-entry case
        Seq("bat bat bat"))
      batches.foreach { b =>
        memA.addData(b: _*); memB.addData(b: _*)
        qA.processAllAvailable(); qB.processAllAvailable()
        assert(lastTop(outB) == lastTop(outA))
      }
      assert(lastTop(outB) == List(("the", 4L), ("bat", 4L), ("cat", 2L))
        .sortBy { case (k, v) => (-v, k) })
    } finally { qA.stop(); qB.stop() }
  }

  test("sink intake is bounded by the threshold pushdown, not the vocabulary") {
    val out = tmpDir("tb-out")
    val sink = new TopNUpdateSink(out, 3)
    // fill the bounded state (min = 10)
    sink(Seq(("a", 30L), ("b", 20L), ("c", 10L)).toDF("word", "cnt"), 0L)
    assert(sink.lastIntakeRows == 3)
    // a 1000-key batch where only 2 rows can beat the current minimum:
    // the driver must see ONLY those 2, and the result must still be
    // exactly the max-merge of the full batch
    val bigVocab = (1 to 998).map(i => (f"w$i%04d", 5L)) ++
      Seq(("d", 40L), ("b", 21L))
    sink(bigVocab.toDF("word", "cnt"), 1L)
    assert(sink.lastIntakeRows == 2,
      s"driver saw ${sink.lastIntakeRows} rows of a 1000-key batch")
    val last = ExactlyOnceSink.committed(out).max
    val top = spark.read.parquet(ExactlyOnceSink.batchDir(out, last))
      .orderBy(col("cnt").desc, col("word"))
      .as[(String, Long)].collect().toList
    assert(top == List(("d", 40L), ("a", 30L), ("b", 21L)))
  }

  test("update-mode sink work stays flat as the vocabulary grows") {
    val out = tmpDir("tf-out")
    val sink = new TopNUpdateSink(out, 5)
    sink(Seq(("s1", 90L), ("s2", 80L), ("s3", 70L), ("s4", 60L), ("s5", 50L))
      .toDF("word", "cnt"), 0L)
    // batches with 100× growing vocabularies, one contender each:
    // driver intake must stay at the contender count, not track vocab
    val intakes = Seq(100, 1000, 10000).zipWithIndex.map { case (v, i) =>
      val batch = (1 to v).map(j => (f"low$j%06d", 10L)) ++ Seq((s"hi$i", 100L + i))
      sink(batch.toDF("word", "cnt"), i + 1L)
      sink.lastIntakeRows
    }
    assert(intakes == Seq(1L, 1L, 1L), s"sink intake grew with vocabulary: $intakes")
  }

  test("snapshot retention: only the newest K survive, restore unaffected; n <= 0 refused") {
    intercept[IllegalArgumentException](new TopNUpdateSink(tmpDir("tn-bad"), 0))
    val out = tmpDir("tn-retain")
    val sink = new TopNUpdateSink(out, 3)
    (0 until 12).foreach(i =>
      sink(Seq((s"w$i", 10L + i)).toDF("word", "cnt"), i.toLong))
    // every batch wrote a full snapshot; only the last 8 remain
    val ids = ExactlyOnceSink.committed(out)
    assert(ids == (4L to 11L).toSet, s"retention kept: $ids")
    import scala.jdk.CollectionConverters._
    val ls = java.nio.file.Files.list(java.nio.file.Path.of(out))
    val dirs = try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("batch=")).toList finally ls.close()
    assert(dirs.size == 8, s"snapshot dirs not reclaimed: $dirs")
    // a fresh sink restores from the newest surviving snapshot
    val sink2 = new TopNUpdateSink(out, 3)
    sink2(Seq(("tail", 1L)).toDF("word", "cnt"), 12L)
    assert(lastTop(out).map(_._1) == List("w11", "w10", "w9"))
  }

  test("update-mode top-N restores sink state across a restart") {
    val in = tmpDir("tr-in")
    val (out, ckpt) = (tmpDir("tr-out"), tmpDir("tr-ckpt"))
    def addFile(name: String, text: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(in, name), text + "\n")
    addFile("f0.txt", "alpha beta alpha")
    val q1 = WordCountTopology.updateMode(
      WordCountTopology.fileSpout(in), out, ckpt, topN = 5).run(spark)
    try q1.processAllAvailable() finally q1.stop()
    assert(lastTop(out) == List(("alpha", 2L), ("beta", 1L)))

    addFile("f1.txt", "beta beta gamma")
    val q2 = WordCountTopology.updateMode(
      WordCountTopology.fileSpout(in), out, ckpt, topN = 5).run(spark)
    try q2.processAllAvailable() finally q2.stop()
    // counts continue from the checkpointed aggregation AND the sink's
    // restored top-N (alpha saw no update after restart — it must
    // come from the restored state)
    assert(lastTop(out) == List(("beta", 3L), ("alpha", 2L), ("gamma", 1L)))
  }
}
