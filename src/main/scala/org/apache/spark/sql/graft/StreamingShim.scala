package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** `private[sql]` access shim for graft's v1 streaming source — the
  * same reason Delta Lake's source tree lives under
  * `org.apache.spark.sql.delta`: a v1 `Source.getBatch` must hand
  * back an `isStreaming = true` DataFrame, and the blessed way to
  * wrap an arbitrary planned batch query that way is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`
  * (what Kafka/File sources use), which is `private[sql]`.
  */
object StreamingShim {
  /** Re-root `df`'s planned RDD as an isStreaming LogicalRDD. The
    * query still executes distributed; planning happens here (no AQE
    * inside the wrapped stage — acceptable for per-batch CDC deltas,
    * which are change-sized, not table-sized).
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
