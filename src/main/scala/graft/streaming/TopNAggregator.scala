package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's topNBolt as a first-class Spark aggregate
  * function: a typed Aggregator whose buffer is the bounded [[TopN]]
  * monoid, so partial aggregation (reduce/merge across partitions)
  * IS the bolt's mergeFn — usable in batch `agg()`, windowed
  * streaming aggs, and groupBy alike.
  */
class TopNAggregator(n: Int)
    extends Aggregator[(String, Long), Map[String, Long], Seq[(String, Long)]] {
  private val monoid = TopN(n)

  def zero: Map[String, Long] = monoid.empty
  def reduce(buf: Map[String, Long], a: (String, Long)): Map[String, Long] =
    monoid.combine(buf, Map(a._1 -> a._2))
  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    monoid.combine(x, y)
  def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (k, v) => (-v, k) }

  def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
