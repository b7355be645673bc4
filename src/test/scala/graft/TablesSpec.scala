package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Events-loader hardening: the driver has shipped `events.ts` as
  * parquet TIMESTAMP(NANOS) (reads as long with the legacy switch)
  * and as naive TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ); a future
  * regeneration could ship UTC-adjusted µs. The loader must produce
  * the identical session-TZ timestamp column for all three, so a
  * testdata regeneration can never silently break the 13
  * events-family queries again (r7's hard regression).
  */
class TablesSpec extends SparkSpecBase {

  // one instant, three on-disk representations
  private val micros = Seq(1700000000000000L, 1700000123456789L, 1700009999999999L)

  test("ts normalization: ns-as-long, ntz-µs and utc-µs fixtures agree") {
    val s = spark
    import s.implicits._

    // fixture A: legacy nanos-as-long (what a TIMESTAMP(NANOS) file
    // becomes after the nanosAsLong read; extra ns digits truncate)
    val nsLong = micros.map(us => us * 1000L + 999L).toDF("ts")
      .withColumn("user_id", lit(1L))
    // fixture B: naive µs — write NTZ parquet and read it back, so the
    // type really round-trips through the parquet reader
    val ntzDir = tmpDir("events-ntz")
    micros.toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        lit(1L).as("user_id"))
      .write.mode("overwrite").parquet(ntzDir)
    val ntz = spark.read.parquet(ntzDir)
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    // fixture C: UTC-adjusted µs (Spark's default timestamp)
    val utcDir = tmpDir("events-utc")
    micros.toDF("us").select(
        timestamp_micros(col("us")).as("ts"), lit(1L).as("user_id"))
      .write.mode("overwrite").parquet(utcDir)
    val utc = spark.read.parquet(utcDir)
    assert(utc.schema("ts").dataType == TimestampType)

    def values(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val norm = Tables.normalizeEventsTs(df)
      assert(norm.schema("ts").dataType == TimestampType,
        s"normalized ts must be session-TZ timestamp, got ${norm.schema("ts").dataType}")
      norm.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    }
    val a = values(nsLong)
    assert(a == values(ntz) && a == values(utc) && a == micros.sorted)
  }

  test("real events table loads with session-TZ ts and rows") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
  }
}
