package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: ≤ k (score, id) pairs kept sorted by
  * (score desc, id asc). This is a commutative monoid — insertion
  * order never changes the result, because the ordering is total and
  * the buffer keeps exactly the k greatest elements — which is
  * precisely the property the reference demands of bolt state
  * (Processor.hs:43-54 `mergeFn`) and implements for its top-N bolt
  * with a bounded PSQueue (WordCountSample.hs:118-216).
  */
final class TopKBuffer(val k: Int, val distinct: Boolean = false) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  /** Set-semantics membership: binary search for an identical
    * (score, id) pair in the sorted buffer — O(log k) per insert,
    * only consulted in distinct mode.
    */
  private def contains(s: Double, id: Long): Boolean = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (beats(s, id, mid)) hi = mid - 1
      else if (scores(mid) == s && ids(mid) == id) return true
      else lo = mid + 1
    }
    false
  }

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !beats(s, id, n - 1)) return
    if (distinct && contains(s, id)) return
    var pos = if (n == k) n - 1 else n
    if (n < k) n += 1
    while (pos > 0 && beats(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s
    ids(pos) = id
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** The reference's bounded top-N bolt as a native Catalyst aggregate:
  * `graft_topk(score, id, k)` returns the k greatest (score, id)
  * pairs per group, ordered (score desc, id asc), as
  * array<struct<score, id>>.
  *
  * Scale rationale: the window formulation of per-group top-N
  * (row_number over partitionBy(key) + filter) shuffles and sorts
  * EVERY row of every group. As a TypedImperativeAggregate this gets
  * Spark's partial aggregation: each map task reduces its slice to
  * ≤ k pairs per group before the exchange, so shuffle volume is
  * O(groups × k × tasks), independent of row count — the same
  * map-side bound the reference gets from its monoid bolt contract.
  * Deterministic whenever ids are unique within a group (ties on
  * score break by id).
  */
case class TopKByScore(
    left: Expression,
    right: Expression,
    k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"graft_topk k must be positive, got $k")

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, distinct)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    // NaN is excluded like null: it is incomparable under the
    // buffer's total order, and admitting one would both break the
    // sorted invariant (nothing beats NaN, NaN beats nothing) and
    // make results insertion-order-dependent — the monoid property
    // the whole design rests on
    if (s != null && id != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      b.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](b.n)(i =>
      new GenericInternalRow(Array[Any](b.scores(i), b.ids(i)))))

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k, distinct)
    var i = 0
    // stored sorted; re-inserting keeps the invariant
    while (i < n) { b.insert(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}
