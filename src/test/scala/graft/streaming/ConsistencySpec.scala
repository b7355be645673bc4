package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming/batch consistency: the same event-time aggregation over
  * the same data must agree whether `events` is read as a table or as
  * a stream — the declarative-topology payoff (one query, two
  * execution modes).
  */
class ConsistencySpec extends SparkSpecBase {
  import spark.implicits._

  test("stream-stream interval join: purchases match clicks within the window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val cdf = clicks.toDF().toDF("cts", "user_id").withWatermark("cts", "1 hour")
    val bdf = buys.toDF().toDF("bts", "buyer_id").withWatermark("bts", "1 hour")
    val joined = bdf.join(cdf,
      col("buyer_id") === col("user_id") &&
        col("cts") <= col("bts") &&
        col("cts") >= col("bts") - expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj").start()
    try {
      clicks.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 08:00:00"), 2L))
      buys.addData(
        (Timestamp.valueOf("2024-01-01 10:20:00"), 1L),  // joins (30m window)
        (Timestamp.valueOf("2024-01-01 10:20:00"), 2L))  // click too old
      q.processAllAvailable()
      val got = spark.table("ssj").select("buyer_id").as[Long].collect().toList
      assert(got == List(1L))
    } finally q.stop()
  }

  test("stream-static join: stream enriched against a dimension table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Int]
    val dim = Tables.nation(spark, sfDir).select(
      col("n_nationkey").as("key"), col("n_name"))
    val q = mem.toDF().toDF("key").join(dim, "key")
      .writeStream.format("memory").queryName("stj").start()
    try {
      mem.addData(0, 1, 999) // 999 has no dim row
      q.processAllAvailable()
      assert(spark.table("stj").count() == 2)
    } finally q.stop()
  }

  test("tumbling-window aggregation agrees between stream and batch") {
    val batch = EventTimeOps.tumblingCounts(Tables.events(spark, sfDir), "1 hour", "100 days")
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm").as("w"),
        col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val q = EventTimeOps.tumblingCounts(
        Tables.eventsStream(spark, sfDir), "1 hour", "100 days")
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm").as("w"),
        col("event_type"), col("n"))
      .writeStream.format("memory").queryName("cons")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cons")
        .groupBy("w", "event_type").agg(max("n").as("n")) // latest update per window
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("SessionBolt sessions equal batch q17's session boundaries on the same slice") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sql = spark.sqlContext
    val batch = graft.operators.Relational.q17_sessionize(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val rows = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val mem = MemoryStream[(Long, Timestamp)]
    val q = SessionBolt.sessions(
        mem.toDF().toDF("user_id", "ts"), gapSeconds = 1800, watermark = "1 second")
      .writeStream.format("memory").queryName("sbolt")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
      // a far-future sentinel advances the watermark past every open
      // session's gap horizon, so the event-time timeouts flush them
      val maxMs = rows.map(_._2.getTime).max
      mem.addData((-1L, new Timestamp(maxMs + 10L * 24 * 3600 * 1000)))
      q.processAllAvailable()
      val streamed = spark.table("sbolt")
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), max("n_events").as("max_events"),
          (round(avg("n_events") * 10000) / 10000).as("avg_events"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    } finally q.stop()
  }

  test("streaming dedup bolt: re-delivered keys emitted once, state watermark-bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sql = spark.sqlContext
    val docs = MemoryStream[(Timestamp, Long)]
    val deduped = Bolts.dedup(Seq("doc_id"), "ts", "10 minutes")
      .transform(docs.toDF().toDF("ts", "doc_id"))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      docs.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 10:00:01"), 1L), // dup within batch
        (Timestamp.valueOf("2024-01-01 10:00:02"), 2L))
      q.processAllAvailable()
      docs.addData(
        (Timestamp.valueOf("2024-01-01 10:01:00"), 1L), // dup across batches
        (Timestamp.valueOf("2024-01-01 10:01:00"), 3L))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toList
      assert(ids == List(1L, 2L, 3L))
    } finally q.stop()
  }
}
