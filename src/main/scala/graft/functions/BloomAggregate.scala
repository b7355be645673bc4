package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable Bloom filter over long keys — the join-pruning sketch
  * for the regime between "dim broadcasts whole" (hash-map semi
  * join) and "both sides shuffle" (sort-merge): when the dim's KEY
  * SET fits a few megabytes of bits but its rows don't fit a
  * broadcast hash table, a bloom of the keys rides to every fact
  * task as a narrow codegen'd pre-filter ([[BloomMightContain]]) and
  * cuts the fact shuffle to ~selectivity + ε before the exact join.
  * This is the pattern behind Spark's own runtime row-level filtering
  * (spark.sql.optimizer.runtime.bloomFilter) — built here as an
  * explicit, persistable sketch with the same mergeable-summaries
  * discipline as graft_bitmap / graft_topk / graft_heavy_hitters:
  * map-side combinable fixed-size state, merge = bitwise OR
  * (associative, commutative, lossless in the sketch domain).
  *
  * `graft_bloom(key, numBits, numHashes)` returns the filter as
  * binary (numBits/8 bytes, numBits forced to a power of two so the
  * index mask is a single AND). False-positive rate for n keys ≈
  * (1 − e^(−k·n/m))^k; false negatives are impossible, which is what
  * makes the pre-filter safe — the exact join downstream only ever
  * sees a superset of the matching rows.
  *
  * Hashing is Kirsch–Mitzenmotte double hashing off two XXH64 seeds
  * (h1 + i·h2, h2 forced odd), the standard trick that gets k
  * independent-enough probes from two hash evaluations.
  */
final class BloomBuffer(val bits: Array[Long])

case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] with UnaryLike[Expression] {

  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"graft_bloom numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"graft_bloom numHashes must be in [1, 16], got $numHashes")

  override def prettyName: String = "graft_bloom"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(new Array[Long](numBits / 64))

  override def update(b: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) GraftHashOps.bloomSet(b.bits, v.asInstanceOf[Long], numHashes)
    b
  }

  override def merge(b: BloomBuffer, o: BloomBuffer): BloomBuffer = {
    var i = 0
    while (i < b.bits.length) { b.bits(i) |= o.bits(i); i += 1 }
    b
  }

  // the PUBLISHED sketch carries the header (built-k travels with the
  // bytes); the shuffle buffer below stays raw words — it never
  // leaves the aggregation
  override def eval(b: BloomBuffer): Any =
    GraftHashOps.bloomBytesWithHeader(b.bits, numHashes)

  override def serialize(b: BloomBuffer): Array[Byte] =
    GraftHashOps.longsToBytes(b.bits)

  override def deserialize(bytes: Array[Byte]): BloomBuffer =
    new BloomBuffer(GraftHashOps.bytesToLongs(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}
