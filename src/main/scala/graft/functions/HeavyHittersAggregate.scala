package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra–Gries frequency summary: ≤ `capacity` counters plus
  * the exact stream length. The counters are LOWER BOUNDS on true
  * counts, and the classic guarantee holds under arbitrary merge
  * trees (Agarwal et al., "Mergeable Summaries", PODS 2012): for any
  * item, true − lb ≤ n / (capacity + 1) — so every item with true
  * frequency above n/(capacity+1) is guaranteed present. This is the
  * reference's bounded top-N bolt discipline (a fixed-size monoid
  * state no input volume can grow, WordCountSample.hs:118-216)
  * applied to the case its PSQueue cannot handle: key cardinality
  * far beyond the bound.
  */
final class MGBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[UTF8String, Array[Long]]()
  var total = 0L

  /** Classic MG point update (weight 1). When full and untracked,
    * every counter pays 1 and the arrival is discarded — amortized
    * O(1): each decrement sweep removes capacity+1 units of counted
    * mass, and mass only enters one unit per row.
    */
  def add(item: UTF8String): Unit = {
    total += 1
    val slot = counts.get(item)
    if (slot != null) slot(0) += 1
    else if (counts.size < capacity)
      // the input UTF8String may point into a reused row buffer —
      // keys that outlive the row must own their bytes
      counts.put(item.clone(), Array(1L))
    else {
      val it = counts.values().iterator()
      while (it.hasNext) it.next()(0) -= 1
      counts.values().removeIf(_(0) <= 0L)
    }
  }

  def mergeFrom(o: MGBuffer): Unit = {
    total += o.total
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val slot = counts.get(e.getKey)
      if (slot != null) slot(0) += e.getValue()(0)
      // o's keys are already owned clones, but o is mutable scratch
      // the framework may reuse — clone defensively
      else counts.put(e.getKey.clone(), Array(e.getValue()(0)))
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive: ≤ capacity entries can exceed it, and
      // the subtraction is exactly the step whose error the mergeable-
      // summaries bound accounts for
      val vs = new Array[Long](counts.size)
      val vi = counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vs(i) = vi.next()(0); i += 1 }
      java.util.Arrays.sort(vs)
      val d = vs(vs.length - capacity - 1)
      val ci = counts.values().iterator()
      while (ci.hasNext) ci.next()(0) -= d
      counts.values().removeIf(_(0) <= 0L)
    }
  }
}

/** `graft_heavy_hitters(item, capacity)`: one-pass bounded-state
  * candidate recovery for frequent items over UNBOUNDED key
  * cardinality. Returns struct(total, items: array<struct<tok, lb>>)
  * with items sorted (lb desc, tok asc) — `lb` is the Misra–Gries
  * lower bound, `total` the exact row count, so
  * `lb + total/(capacity+1)` bounds any true count from above and
  * presence is guaranteed for anything more frequent than
  * total/(capacity+1).
  *
  * Scale rationale: the exact formulation (q01/q02's wordcount →
  * top-N) shuffles one row per DISTINCT key — at web scale the token
  * vocabulary is corpus-sized. Here each map task reduces its slice
  * to a ≤ capacity-entry summary before the exchange (partial
  * aggregation), so shuffle volume is O(tasks × capacity),
  * independent of vocabulary. The summary is a candidate
  * SUPERSET generator: q47 re-counts candidates exactly in a second
  * k-bounded pass, making the end result exact and deterministic
  * (summary contents vary with merge order; the guarantee — and
  * therefore the verified top-k — does not).
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression] {

  require(capacity > 0, s"graft_heavy_hitters capacity must be positive, got $capacity")

  override def prettyName: String = "graft_heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = { b.mergeFrom(o); b }

  override def eval(b: MGBuffer): Any = {
    val entries = new Array[(UTF8String, Long)](b.counts.size)
    val it = b.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0))
      i += 1
    }
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    new GenericInternalRow(Array[Any](b.total,
      new GenericArrayData(sorted.map { case (t, c) =>
        new GenericInternalRow(Array[Any](t, c))
      })))
  }

  override def serialize(b: MGBuffer): Array[Byte] = {
    var size = 12 // total + entry count
    val it0 = b.counts.keySet().iterator()
    while (it0.hasNext) size += 12 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(size)
    bb.putLong(b.total)
    bb.putInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(e.getValue()(0))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MGBuffer(capacity)
    b.total = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      b.counts.put(UTF8String.fromBytes(arr), Array(bb.getLong))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}
