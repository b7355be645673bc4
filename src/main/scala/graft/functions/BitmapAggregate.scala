package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable EXACT-distinct bitmap sketches — the exact companion of
  * q46's HLL pattern (the pre-aggregated sketch table: sketch once
  * per fine bucket, every coarser rollup merges sketches and never
  * rescans the facts), for key domains dense enough to bitmap.
  *
  * `graft_bitmap(key)` aggregates a group's keys into a bitset
  * serialized as binary (one bit per key — a dense-domain
  * simplification of RoaringBitmap, which is what you'd swap in for
  * sparse/64-bit domains); `graft_bitmap_union(bitmap)` ORs already-
  * built sketches; `graft_bitmap_count(bitmap)` reads a cardinality.
  * Union is LOSSLESS by construction (bitwise OR), so a rollup from
  * persisted fine-grained sketches is bit-identical to sketching the
  * coarse bucket directly — and unlike HLL the counts are exact,
  * which keeps the whole pattern inside the DuckDB hash gate.
  *
  * Scale shape: both aggregates are map-side combinable (fixed-size
  * mergeable state like graft_topk / graft_heavy_hitters); sketch
  * bytes ∝ domain/8 regardless of row count. Keys must sit in
  * [0, maxKey) — enforced, because silently dropping an
  * out-of-range key would corrupt an "exact" count.
  */
final class BitmapBuffer(val bits: java.util.BitSet)

case class BitmapAgg(
    child: Expression,
    maxKey: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuffer] with UnaryLike[Expression] {

  require(maxKey > 0, s"graft_bitmap maxKey must be positive, got $maxKey")

  override def prettyName: String = "graft_bitmap"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BitmapBuffer =
    new BitmapBuffer(new java.util.BitSet())

  override def update(b: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      require(k >= 0 && k < maxKey,
        s"graft_bitmap key $k outside [0, $maxKey) — widen maxKey or use a sparse sketch")
      b.bits.set(k.toInt)
    }
    b
  }

  override def merge(b: BitmapBuffer, o: BitmapBuffer): BitmapBuffer = {
    b.bits.or(o.bits); b
  }

  override def eval(b: BitmapBuffer): Any = b.bits.toByteArray

  override def serialize(b: BitmapBuffer): Array[Byte] = b.bits.toByteArray

  override def deserialize(bytes: Array[Byte]): BitmapBuffer =
    new BitmapBuffer(java.util.BitSet.valueOf(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapAgg =
    copy(child = newChild)
}

/** OR-merge of already-built bitmap sketches (binary column in,
  * binary out): the rollup side of the sketch-table pattern.
  */
case class BitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_bitmap_union"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BitmapBuffer =
    new BitmapBuffer(new java.util.BitSet())

  override def update(b: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v != null)
      b.bits.or(java.util.BitSet.valueOf(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: BitmapBuffer, o: BitmapBuffer): BitmapBuffer = {
    b.bits.or(o.bits); b
  }

  override def eval(b: BitmapBuffer): Any = b.bits.toByteArray

  override def serialize(b: BitmapBuffer): Array[Byte] = b.bits.toByteArray

  override def deserialize(bytes: Array[Byte]): BitmapBuffer =
    new BitmapBuffer(java.util.BitSet.valueOf(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapUnionAgg =
    copy(child = newChild)
}
