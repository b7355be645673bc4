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
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(!SparseBitmap.looksSerialized(bytes),
        "graft_bitmap_union got a graft_bitmap64 sketch — use graft_bitmap64_union")
      b.bits.or(java.util.BitSet.valueOf(bytes))
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapUnionAgg =
    copy(child = newChild)
}

/** Roaring-style sparse exact-distinct sketch over the FULL signed
  * 64-bit key domain — the swap-in [[BitmapAgg]]'s scaladoc promises
  * for domains too sparse or too wide to bitmap densely (bytes ∝
  * domain/8 there; ∝ #containers + #keys here).
  *
  * Layout follows the published RoaringBitmap design (Chambi,
  * Lemire, Kaser, Godin — "Better bitmap performance with Roaring
  * bitmaps"): the key space splits into 65 536-value chunks keyed by
  * the high bits (`key >> 16`, arithmetic so negative keys chunk
  * consistently); each chunk stores its low 16 bits either as a
  * sorted short array (≤ 4096 entries) or, past that, as a 8 KiB
  * bitmap. Membership, OR, and cardinality never touch chunks the
  * key set doesn't populate.
  *
  * Like the published design, a container serializes as whichever of
  * THREE forms is smallest for its key set — sorted array (2 B/key),
  * raw bitmap (8 KiB flat), or RUN LENGTHS (4 B/run — contiguous id
  * ranges, the snowflake/sequence shape, collapse to almost nothing).
  *
  * The serialized form is CANONICAL — containers ascending by chunk
  * key, the per-container form chosen by sizes computed from the
  * FINAL key set (deterministic tie-break run ≺ array ≺ bitmap) — so
  * a sketch's bytes are a pure function of its key SET, independent
  * of insertion or merge order. That is what lets the q58 rollup
  * spec assert bit-equality between merged monthly sketches and a
  * directly-built year sketch, the same lossless-merge contract
  * q51's dense OR has.
  */
final class SparseBitmap {
  import SparseBitmap._
  val chunks = new java.util.TreeMap[Long, Container]()

  def add(key: Long): Unit =
    chunks.computeIfAbsent(key >> 16, _ => new Container)
      .add((key & 0xffffL).toInt)

  def or(o: SparseBitmap): Unit =
    o.chunks.forEach { (hi, c) =>
      val mine = chunks.get(hi)
      if (mine == null) chunks.put(hi, c.copy()) else mine.or(c)
    }

  def cardinality: Long = {
    var n = 0L
    chunks.forEach((_, c) => n += c.card)
    n
  }

  def contains(key: Long): Boolean = {
    val c = chunks.get(key >> 16)
    c != null && c.contains((key & 0xffffL).toInt)
  }

  def serialize: Array[Byte] = {
    // one canonical-form computation (incl. the run scan) per
    // container, shared by the sizing pass and the write pass
    val forms = new Array[(Long, Container, Byte, Int, Int)](chunks.size)
    var payload = 0
    var i = 0
    chunks.forEach { (hi, c) =>
      val (fmt, size, runs) = c.canonicalForm
      forms(i) = (hi, c, fmt, size, runs)
      payload += size
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(8 + chunks.size * 13 + payload)
    bb.putInt(Magic)
    bb.putInt(chunks.size)
    forms.foreach { case (hi, c, fmt, _, runs) =>
      bb.putLong(hi)
      bb.putInt(c.card)
      c.writePayload(bb, fmt, runs)
    }
    bb.array()
  }
}

object SparseBitmap {
  /** Array containers hold at most this many entries (Roaring's
    * break-even: 4096 shorts = 8 KiB = the bitmap's fixed size).
    */
  val ArrayCap = 4096
  private val Words = 1024
  private val WordBytes = Words * 8
  /** Leading magic distinguishes the sparse format from [[BitmapAgg]]'s
    * raw-BitSet bytes so a mixed-up column fails loudly in
    * [[SparseBitmapCount]] / [[deserialize]] instead of popcounting
    * garbage. ("GBS7" — bumped when the run-container form joined the
    * wire layout.)
    */
  val Magic = 0x47425337 // "GBS7"
  /** The pre-run-container wire form (array/bitmap only, no form
    * tag). Recognized only to FAIL LOUDLY: new readers reject it with
    * a rebuild message, and the dense-side guards still classify its
    * bytes as sparse — the loud-failure contract survives the format
    * bump instead of old sketches popcounting as garbage.
    */
  private val OldMagic = 0x47425336 // "GBS6"
  /** Serialized container forms (one tag byte each). */
  private val FmtArray: Byte = 0
  private val FmtBitmap: Byte = 1
  private val FmtRuns: Byte = 2

  /** One 65 536-value chunk: sorted short array while small, 8 KiB
    * bitmap once past [[ArrayCap]]. Cardinality only grows, so the
    * representation is a pure function of it (array iff ≤ ArrayCap) —
    * the invariant canonical serialization rests on.
    */
  final class Container {
    private[functions] var arr: Array[Char] = new Array[Char](8)
    private[functions] var n: Int = 0
    private[functions] var words: Array[Long] = null

    def card: Int = n

    def contains(low: Int): Boolean =
      if (words != null) (words(low >>> 6) & (1L << (low & 63))) != 0L
      else java.util.Arrays.binarySearch(arr, 0, n, low.toChar) >= 0

    def add(low: Int): Unit =
      if (words != null) {
        val w = low >>> 6
        val bit = 1L << (low & 63)
        if ((words(w) & bit) == 0L) { words(w) |= bit; n += 1 }
      } else {
        val pos = java.util.Arrays.binarySearch(arr, 0, n, low.toChar)
        if (pos < 0) {
          if (n == ArrayCap) { promote(); add(low) }
          else {
            if (n == arr.length)
              arr = java.util.Arrays.copyOf(arr, arr.length * 2)
            val ins = -pos - 1
            System.arraycopy(arr, ins, arr, ins + 1, n - ins)
            arr(ins) = low.toChar
            n += 1
          }
        }
      }

    private def promote(): Unit = {
      words = new Array[Long](Words)
      var i = 0
      while (i < n) { val v = arr(i); words(v >>> 6) |= 1L << (v & 63); i += 1 }
      arr = null
    }

    def or(o: Container): Unit =
      if (o.words != null) {
        if (words == null) promote()
        var i = 0
        var c = 0
        while (i < Words) {
          words(i) |= o.words(i)
          c += java.lang.Long.bitCount(words(i))
          i += 1
        }
        n = c
      } else if (words != null) {
        var i = 0
        while (i < o.n) { add(o.arr(i)); i += 1 }
      } else {
        // both sorted arrays: two-pointer merge — the per-element
        // binary-insert alternative is quadratic when both sides sit
        // near the cap, and this path runs in EVERY partial-agg merge
        val tmp = new Array[Char](n + o.n)
        var i = 0
        var j = 0
        var k = 0
        while (i < n && j < o.n) {
          val x = arr(i)
          val y = o.arr(j)
          if (x == y) { tmp(k) = x; i += 1; j += 1 }
          else if (x < y) { tmp(k) = x; i += 1 }
          else { tmp(k) = y; j += 1 }
          k += 1
        }
        while (i < n) { tmp(k) = arr(i); i += 1; k += 1 }
        while (j < o.n) { tmp(k) = o.arr(j); j += 1; k += 1 }
        arr = tmp
        n = k
        // serialization derives its form from the final set, not the
        // in-memory representation, so promoting here (when the MERGED
        // distinct count crosses the cap) preserves canonical bytes
        if (k > ArrayCap) promote()
      }

    def copy(): Container = {
      val c = new Container
      c.n = n
      if (words != null) c.words = words.clone() else c.arr = java.util.Arrays.copyOf(arr, math.max(n, 8))
      c
    }

    /** Runs of consecutive values in this container's key set. */
    private def runCount: Int = {
      if (n == 0) return 0
      var r = 0
      if (words != null) {
        // a run starts at every set bit whose predecessor is clear:
        // popcount(word & ~(word << 1 | carry-in))
        var carry = 0L // bit 63 of the previous word
        var w = 0
        while (w < Words) {
          val x = words(w)
          r += java.lang.Long.bitCount(x & ~((x << 1) | carry))
          carry = x >>> 63
          w += 1
        }
      } else {
        r = 1
        var i = 1
        while (i < n) { if (arr(i) != arr(i - 1) + 1) r += 1; i += 1 }
      }
      r
    }

    /** Canonical serialized form, its payload size, and the run count
      * backing it: the SMALLEST of runs (4 + 4·r), array (2·n),
      * bitmap (8 KiB), ties broken run ≺ array ≺ bitmap — all derived
      * from the final key set, so the choice is independent of build
      * history.
      */
    private[functions] def canonicalForm: (Byte, Int, Int) = {
      val runs = runCount
      val runBytes = 4 + 4 * runs
      val arrBytes = 2 * n
      if (runBytes <= arrBytes && runBytes <= WordBytes) (FmtRuns, runBytes, runs)
      else if (arrBytes <= WordBytes) (FmtArray, arrBytes, runs)
      else (FmtBitmap, WordBytes, runs)
    }

    /** Iterate the key set ascending regardless of representation. */
    private def foreachValue(f: Int => Unit): Unit =
      if (words != null) {
        var w = 0
        while (w < Words) {
          var bits = words(w)
          while (bits != 0L) {
            f((w << 6) | java.lang.Long.numberOfTrailingZeros(bits))
            bits &= bits - 1
          }
          w += 1
        }
      } else {
        var i = 0
        while (i < n) { f(arr(i)); i += 1 }
      }

    def writePayload(bb: java.nio.ByteBuffer, fmt: Byte, runs: Int): Unit = fmt match {
      case FmtArray =>
        bb.put(FmtArray)
        foreachValue(v => bb.putChar(v.toChar))
      case FmtBitmap =>
        bb.put(FmtBitmap)
        // n > 4096 here under the only-grows invariant, so words is
        // populated; stay total if it ever isn't
        if (words != null) {
          var i = 0
          while (i < Words) { bb.putLong(words(i)); i += 1 }
        } else {
          val tmp = new Array[Long](Words)
          foreachValue(v => tmp(v >>> 6) |= 1L << (v & 63))
          var i = 0
          while (i < Words) { bb.putLong(tmp(i)); i += 1 }
        }
      case _ =>
        bb.put(FmtRuns)
        bb.putInt(runs)
        // (start, length-1) per run, both 16-bit
        var start = -2
        var prev = -2
        foreachValue { v =>
          if (v != prev + 1) {
            if (start >= 0) { bb.putChar(start.toChar); bb.putChar((prev - start).toChar) }
            start = v
          }
          prev = v
        }
        if (start >= 0) { bb.putChar(start.toChar); bb.putChar((prev - start).toChar) }
    }
  }

  private def checkMagic(bb: java.nio.ByteBuffer): Unit = {
    require(bb.remaining >= 8, "not a graft_bitmap64 sketch (truncated)")
    val m = bb.getInt()
    require(m != OldMagic,
      "old graft_bitmap64 wire format (GBS6) — rebuild the sketch with this build")
    require(m == Magic,
      "not a graft_bitmap64 sketch (bad magic) — dense graft_bitmap bytes?")
  }

  def deserialize(bytes: Array[Byte]): SparseBitmap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    checkMagic(bb)
    // every structural inconsistency — truncation, a payload emitting
    // more values than the header card, a bad run count — dies as a
    // loud IllegalArgumentException here, never as an index/underflow
    // error from inside the container walk
    def corrupt(what: String): Nothing =
      throw new IllegalArgumentException(s"corrupt sparse sketch: $what")
    def needs(n: Int): Unit = if (bb.remaining < n) corrupt("truncated payload")
    needs(4)
    val nChunks = bb.getInt()
    if (nChunks < 0) corrupt(s"negative chunk count $nChunks")
    val sb = new SparseBitmap
    var c = 0
    while (c < nChunks) {
      needs(13) // hi(8) + card(4) + fmt(1)
      val hi = bb.getLong()
      val card = bb.getInt()
      val fmt = bb.get()
      if (card < 1 || card > 65536) corrupt(s"container cardinality $card")
      val cont = new Container
      // in-memory representation follows the only-grows rule (array
      // iff card ≤ ArrayCap) regardless of the serialized form
      val asArray = card <= ArrayCap
      if (asArray) cont.arr = new Array[Char](math.max(card, 8))
      else { cont.words = new Array[Long](Words); cont.arr = null }
      var idx = 0
      def emit(v: Int): Unit = {
        if (idx >= card) corrupt(s"container emits more than card=$card values")
        if (asArray) cont.arr(idx) = v.toChar
        else cont.words(v >>> 6) |= 1L << (v & 63)
        idx += 1
      }
      fmt match {
        case FmtArray =>
          needs(card * 2)
          // strictly-ascending check, FmtRuns' discipline: an unsorted
          // or duplicated payload would build an array whose
          // binarySearch probes answer wrongly with no error, and
          // duplicates would make the header card overcount
          var i = 0
          var prev = -1
          while (i < card) {
            val v = bb.getChar().toInt
            if (v <= prev) corrupt(
              s"array value $v not strictly after the previous value $prev")
            prev = v
            emit(v); i += 1
          }
        case FmtBitmap =>
          if (asArray) corrupt(s"bitmap form with card $card ≤ $ArrayCap is not canonical")
          needs(WordBytes)
          var pc = 0
          var i = 0
          while (i < Words) {
            val w = bb.getLong(); cont.words(i) = w
            pc += java.lang.Long.bitCount(w); i += 1
          }
          if (pc != card) corrupt(s"bitmap popcount $pc != header card $card")
          idx = card
        case FmtRuns =>
          needs(4)
          val nRuns = bb.getInt()
          if (nRuns < 1 || nRuns > card) corrupt(s"run count $nRuns vs card $card")
          needs(nRuns * 4)
          var r = 0
          var prevEnd = -1
          while (r < nRuns) {
            val start = bb.getChar().toInt
            val len = bb.getChar().toInt + 1
            // bounds + order: an overflowing run would index past the
            // 1024-word container (AIOOBE, not the promised IAE) or
            // silently wrap through toChar in the array form, and
            // out-of-order runs would build an unsorted array whose
            // binarySearch probes then answer wrongly with no error
            if (start + len > 65536) corrupt(
              s"run [$start, ${start + len}) exceeds the 16-bit container domain")
            if (start <= prevEnd) corrupt(
              s"run start $start not strictly after the previous run's end $prevEnd")
            prevEnd = start + len - 1
            var v = start
            while (v < start + len) { emit(v); v += 1 }
            r += 1
          }
        case other => corrupt(s"unknown container form $other")
      }
      if (idx != card) corrupt(s"container emitted $idx values, header card $card")
      cont.n = card
      sb.chunks.put(hi, cont)
      c += 1
    }
    sb
  }

  /** Structural check: do these bytes FULLY parse as a sparse sketch
    * (magic + every container header/payload consistent with the
    * total length)? The DENSE operators use this to reject a sparse
    * sketch fed to them — the mirror of [[countSerialized]]'s magic
    * check — so the format mixup fails loudly in BOTH directions. A
    * raw BitSet whose bits happen to spell the magic AND lay out as a
    * byte-exact container walk is the only false positive, which is
    * no accident a real bitmap produces.
    */
  /** Payload length from a container's (card, fmt) header; for the
    * run form reads (and consumes) the run-count int. Returns -1 when
    * the header is structurally invalid.
    */
  private def payloadLen(bb: java.nio.ByteBuffer, card: Int, fmt: Byte): Int =
    fmt match {
      case FmtArray => card * 2
      case FmtBitmap => WordBytes
      case FmtRuns =>
        if (bb.remaining < 4) -1
        else {
          val nRuns = bb.getInt()
          if (nRuns < 0 || nRuns > card) -1 else nRuns * 4
        }
      case _ => -1
    }

  def looksSerialized(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 8) return false
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt()
    if (magic != Magic && magic != OldMagic) return false
    val n = bb.getInt()
    if (n < 0) return false
    var c = 0
    while (c < n) {
      if (bb.remaining < 12) return false
      bb.getLong()
      val card = bb.getInt()
      if (card < 0 || card > 65536) return false
      val len =
        if (magic == OldMagic) // GBS6: no form tag, card implies layout
          (if (card <= ArrayCap) card * 2 else WordBytes)
        else if (bb.remaining < 1) -1
        else payloadLen(bb, card, bb.get())
      if (len < 0 || bb.remaining < len) return false
      bb.position(bb.position() + len)
      c += 1
    }
    bb.remaining == 0
  }

  /** Probe-optimized view of a deserialized sketch: a sorted long[]
    * chunk directory + parallel container array, so a membership test
    * is one unboxed binary search + a container probe — no TreeMap
    * boxing, no allocation per row.
    */
  final class Probe private[SparseBitmap] (his: Array[Long], conts: Array[Container]) {
    def contains(key: Long): Boolean = {
      val i = java.util.Arrays.binarySearch(his, key >> 16)
      i >= 0 && conts(i).contains((key & 0xffffL).toInt)
    }
  }

  private def probeOf(bytes: Array[Byte]): Probe = {
    val sb = deserialize(bytes)
    val his = new Array[Long](sb.chunks.size)
    val conts = new Array[Container](his.length)
    var i = 0
    sb.chunks.forEach { (hi, c) => his(i) = hi; conts(i) = c; i += 1 }
    new Probe(his, conts)
  }

  // Membership probes against SERIALIZED sketch bytes parse each
  // distinct sketch once per thread, via a small per-thread MRU of
  // soft references — with a driver-collected sketch LITERAL (the
  // q53/bloom gating shape) the bytes ride into generated code as
  // ONE reference object per task, so the hot path is a ThreadLocal
  // read + reference compare; a sketch COLUMN yields a fresh array
  // per row (UnsafeRow.getBinary copies) and falls back to a content
  // compare (canonical serialization makes equal sketches
  // byte-equal; ~memcmp, far cheaper than re-parsing). Several slots
  // keep plans probing a handful of sketches (two predicates, an
  // interleaved sketch column) off the re-parse cliff, and the soft
  // references let GC reclaim retained probes on idle long-lived
  // executor threads. (A shared synchronized cache was measured 30×
  // slower at 1B rows: every row of every task serialized on one
  // lock.)
  private val ProbeSlots = 4
  // after this many re-parses on ONE thread, warn once process-wide:
  // the plan is interleaving more sketches than the MRU holds and the
  // scaladoc's restructure-as-join guidance should surface at runtime,
  // not stay buried in comments
  private val ThrashWarnAt = 64
  private val thrashWarned = new java.util.concurrent.atomic.AtomicBoolean(false)
  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.SparseBitmap")

  private final class ProbeCache {
    // (quickFp, bytes, probe): the fp gate turns the per-row cost of a
    // sketch-COLUMN probe from a full memcmp into length+two-word
    // mixing, with memcmp only on fp match
    val slots = new Array[java.lang.ref.SoftReference[(Long, Array[Byte], Probe)]](ProbeSlots)
    var parses = 0
  }
  private val probeSlots = new ThreadLocal[ProbeCache] {
    override def initialValue() = new ProbeCache
  }

  /** Cheap content fingerprint: length mixed with the first post-magic
    * word (chunk count + first chunk hi) and the last word. Canonical
    * serialization makes equal sketches byte-equal, so fp inequality
    * proves byte inequality; fp equality still takes the memcmp.
    */
  private def quickFp(b: Array[Byte]): Long = {
    val n = b.length
    var h = n.toLong
    if (n >= 12) {
      val bb = java.nio.ByteBuffer.wrap(b)
      h = h * 0x9e3779b97f4a7c15L ^ bb.getLong(4)
      h = java.lang.Long.rotateLeft(h, 17) ^ bb.getLong(n - 8)
    }
    h
  }

  def containsSerialized(bytes: Array[Byte], key: Long): Boolean = {
    val cache = probeSlots.get()
    val slots = cache.slots
    val fp = quickFp(bytes)
    var i = 0
    while (i < ProbeSlots) {
      val ref = slots(i)
      if (ref != null) {
        val e = ref.get()
        if (e != null && ((e._2 eq bytes) ||
            (e._1 == fp && java.util.Arrays.equals(e._2, bytes)))) {
          if (i != 0) { // move-to-front: the hot sketch stays a 1-compare hit
            System.arraycopy(slots, 0, slots, 1, i)
            slots(0) = ref
          }
          return e._3.contains(key)
        }
      }
      i += 1
    }
    val fresh = probeOf(bytes)
    cache.parses += 1
    if (cache.parses == ThrashWarnAt && thrashWarned.compareAndSet(false, true))
      log.warn(s"graft_bitmap64 probe cache re-parsed $ThrashWarnAt sketches on one " +
        s"thread (cache holds $ProbeSlots): a plan interleaving many distinct " +
        "sketches per thread re-parses per row — restructure the probe as a " +
        "join (see SparseBitmap scaladoc)")
    System.arraycopy(slots, 0, slots, 1, ProbeSlots - 1)
    slots(0) = new java.lang.ref.SoftReference((fp, bytes, fresh))
    fresh.contains(key)
  }

  /** Container-header walk — cardinality without touching payloads.
    * Same loud-IAE truncation posture as [[deserialize]]: a sketch
    * cut mid-container must not surface as a raw BufferUnderflow /
    * IllegalArgument-from-position from inside the walk.
    */
  def countSerialized(bytes: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    checkMagic(bb)
    def corrupt(what: String): Nothing =
      throw new IllegalArgumentException(s"corrupt sparse sketch: $what")
    def needs(n: Int): Unit = if (bb.remaining < n) corrupt("truncated payload")
    needs(4)
    val nChunks = bb.getInt()
    if (nChunks < 0) corrupt(s"negative chunk count $nChunks")
    var total = 0L
    var c = 0
    while (c < nChunks) {
      needs(13) // hi(8) + card(4) + fmt(1)
      bb.getLong()
      val card = bb.getInt()
      total += card
      val len = payloadLen(bb, card, bb.get())
      if (len < 0) corrupt("bad container header")
      needs(len)
      bb.position(bb.position() + len)
      c += 1
    }
    total
  }
}

/** `graft_bitmap64(key)`: [[SparseBitmap]] as an aggregate — the
  * 64-bit/sparse-domain counterpart of [[BitmapAgg]], same mergeable
  * sketch-table contract (map-side combinable, lossless OR), no
  * domain bound to configure or outgrow.
  */
case class SparseBitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SparseBitmap] with UnaryLike[Expression] {

  override def prettyName: String = "graft_bitmap64"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SparseBitmap = new SparseBitmap

  override def update(b: SparseBitmap, input: InternalRow): SparseBitmap = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: SparseBitmap, o: SparseBitmap): SparseBitmap = {
    b.or(o); b
  }

  override def eval(b: SparseBitmap): Any = b.serialize

  override def serialize(b: SparseBitmap): Array[Byte] = b.serialize

  override def deserialize(bytes: Array[Byte]): SparseBitmap =
    SparseBitmap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SparseBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SparseBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SparseBitmapAgg =
    copy(child = newChild)
}

/** `graft_bitmap64_union(sketch)`: OR-merge of already-built sparse
  * sketches — [[BitmapUnionAgg]]'s rollup role for the sparse format.
  */
case class SparseBitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SparseBitmap] with UnaryLike[Expression] {

  override def prettyName: String = "graft_bitmap64_union"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SparseBitmap = new SparseBitmap

  override def update(b: SparseBitmap, input: InternalRow): SparseBitmap = {
    val v = child.eval(input)
    if (v != null) b.or(SparseBitmap.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: SparseBitmap, o: SparseBitmap): SparseBitmap = {
    b.or(o); b
  }

  override def eval(b: SparseBitmap): Any = b.serialize

  override def serialize(b: SparseBitmap): Array[Byte] = b.serialize

  override def deserialize(bytes: Array[Byte]): SparseBitmap =
    SparseBitmap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SparseBitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SparseBitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SparseBitmapUnionAgg =
    copy(child = newChild)
}
