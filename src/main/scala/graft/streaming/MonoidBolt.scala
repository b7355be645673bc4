package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's bolt-state contract (Processor.hs:43-54) is a
  * commutative monoid: `emptyState`, `mergeFn`, and
  * `tupleToStateConverter` lifting each tuple into state. That is
  * exactly Spark's partial-aggregation contract, so the PREFERRED
  * path for monoid bolts is a plain `groupBy().agg()` — Catalyst
  * gives map-side combine + codegen for free.
  *
  * This class is the escape hatch for monoids Spark's aggregates
  * can't express (bounded top-N queues, sketches): keyed state in the
  * state store via mapGroupsWithState, checkpointed exactly like the
  * reference's clock-keyed snapshots (SnapshotStore.hs) but
  * per-key-partitioned instead of per-process.
  */
trait Monoid[S] extends Serializable {
  def empty: S
  def combine(a: S, b: S): S
}

object MonoidBolt {
  /** Incrementally fold `lift`ed inputs into per-key monoid state,
    * emitting the updated (key, state) on every batch — the
    * transformTupleFn analog.
    */
  def updates[K, I, S](m: Monoid[S], lift: I => S)(
      ds: Dataset[(K, I)])(implicit
      ke: Encoder[K], se: Encoder[S], kse: Encoder[(K, S)]): Dataset[(K, S)] =
    ds.groupByKey(_._1)
      .mapGroupsWithState[S, (K, S)](GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, I)], state: GroupState[S]) =>
          val prev = state.getOption.getOrElse(m.empty)
          val next = rows.foldLeft(prev)((acc, r) => m.combine(acc, lift(r._2)))
          state.update(next)
          key -> next
      }

  /** Output mode required for [[updates]] queries. */
  val outputMode: OutputMode = OutputMode.Update()
}

/** Bounded top-N monoid — the reference's topNBolt/mergeSortBolt state
  * (a PSQueue capped at N, WordCountSample.hs:118-216): keeps the N
  * largest (count, key) pairs; merge keeps max count per key then
  * truncates.
  */
final case class TopN(n: Int) extends Monoid[Map[String, Long]] {
  def empty: Map[String, Long] = Map.empty
  def combine(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val merged = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, math.max(acc.getOrElse(k, Long.MinValue), v))
    }
    if (merged.size <= n) merged
    else if (merged.size == n + 1)
      // the per-row reduce path at capacity: evict the single minimum
      // (smallest count, ties to the LARGEST key — exactly the entry
      // the sort-and-truncate drops last) in one O(n) scan instead of
      // sorting the whole buffer per input row — the PSQueue shape
      merged - merged.maxBy { case (k, v) => (-v, k) }._1
    else merged.toSeq.sortBy { case (k, v) => (-v, k) }.take(n).toMap
  }
}

/** Sum monoid — the countBolt state (`Map word (Sum Int)`). */
object LongSum extends Monoid[Long] {
  def empty = 0L
  def combine(a: Long, b: Long): Long = a + b
}
