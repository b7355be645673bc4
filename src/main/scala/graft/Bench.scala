package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale
  * factor and prints ONE JSON line.
  *
  * Each query is forced through the `noop` sink (full plan execution
  * including projections — `count()` would let Catalyst prune the
  * work). A small warmup query first absorbs session/codegen startup
  * so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: absorb JVM/codegen/session startup
    force(SparkEntry.queries("q04_agg")(spark, sfDir))

    val batchResults = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // streaming flagship: the reference's word-count topology
    // (tokenize -> keyed count -> top-N -> exactly-once sink) over the
    // documents corpus, end to end through Structured Streaming
    val streamResult = try {
      val inDir = java.nio.file.Files.createTempDirectory("bench-st-in").toString
      Tables.documents(spark, sfDir).select("text")
        .coalesce(4).write.mode("overwrite").text(inDir)
      val out = java.nio.file.Files.createTempDirectory("bench-st-out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("bench-st-ckpt").toString
      val t0 = System.nanoTime()
      val q = streaming.WordCountTopology.run(spark, inDir, out, ckpt)
      q.processAllAvailable()
      q.stop()
      Seq("st01_stream_wordcount" -> (System.nanoTime() - t0) / 1e9)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] st01_stream_wordcount failed: $e"); Seq.empty
    }

    val results = batchResults ++ streamResult
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
