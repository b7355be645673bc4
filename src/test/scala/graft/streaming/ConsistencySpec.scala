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
}
