package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native expressions as SQL functions, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works next to the
  * DataFrame builders in [[GraftFunctions]].
  *
  * Install either way:
  *   - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *   - code:   `GraftExtensions.register(spark)` on a live session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** Uniform arity guard: every builder fails a wrong argument count
    * with the same descriptive IAE instead of half the list throwing
    * a raw IndexOutOfBounds from `es(i)`.
    */
  private def arity(name: String, shape: String, n: Int,
                    es: Seq[Expression]): Unit =
    if (es.length != n)
      throw new IllegalArgumentException(
        s"$name expects $shape, got ${es.length} arguments")

  /** Integer literal argument: INT, or a BIGINT within Int range —
    * an out-of-range BIGINT refuses loudly instead of silently
    * truncating through .toInt (a 2^32+1 literal would otherwise
    * read as 1), and a non-literal names itself. One definition for
    * every builder that takes a size/k/capacity argument.
    */
  private def intLit(name: String, arg: String, e: Expression): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
      case Literal(v: Long, _) => throw new IllegalArgumentException(
        s"$name $arg $v is outside Int range")
      case other => throw new IllegalArgumentException(
        s"$name $arg must be an integer literal, got $other")
    }
  }

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double>"),
      (es: Seq[Expression]) => {
        arity("graft_dot", "(a, b)", 2, es); DotProduct(es(0), es(1))
      }),
    ("graft_l2norm",
      info("graft_l2norm", "graft_l2norm(a) - L2 norm of array<double>"),
      (es: Seq[Expression]) => {
        arity("graft_l2norm", "(a)", 1, es); L2Norm(es(0))
      }),
    ("graft_simhash64",
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit simhash of array<string>"),
      (es: Seq[Expression]) => {
        arity("graft_simhash64", "(tokens)", 1, es); SimHash64(es(0))
      }),
    ("graft_rolling_hashes",
      info("graft_rolling_hashes",
        "graft_rolling_hashes(tokens, width) - xxhash64-chained window hashes"),
      (es: Seq[Expression]) => {
        arity("graft_rolling_hashes", "(tokens, width)", 2, es)
        import org.apache.spark.sql.catalyst.expressions.Literal
        es(1) match {
          // total parse: a NULL literal NPE'd via toString, and
          // width <= 0 silently emitted n+1 all-zero hashes — every
          // doc then "contains" every window, all-pairs dedup matches
          case Literal(w: Int, _) if w >= 1 => RollingHashes(es(0), w)
          case Literal(w: Long, _) if w >= 1L && w <= Int.MaxValue =>
            RollingHashes(es(0), w.toInt)
          case other =>
            throw new IllegalArgumentException(
              s"graft_rolling_hashes width must be a positive integer literal, got $other")
        }
      }),
    ("graft_char_stats",
      info("graft_char_stats",
        "graft_char_stats(text) - struct(n_chars, n_alphabet, entropy) of the char distribution"),
      (es: Seq[Expression]) => {
        arity("graft_char_stats", "(text)", 1, es); CharStats(es(0))
      }),
    ("graft_token_stats",
      info("graft_token_stats",
        "graft_token_stats(tokens) - struct(n_tokens, n_uniq, n_big_uniq, top_count) of array<string>"),
      (es: Seq[Expression]) => {
        arity("graft_token_stats", "(tokens)", 1, es); TokenStats(es(0))
      }),
    ("graft_topk",
      info("graft_topk",
        "graft_topk(score, id, k) - bounded top-k (score desc, id asc) aggregate"),
      (es: Seq[Expression]) => {
        // apply the same coercions as the Scala builder
        // (GraftFunctions.topK): update() unboxes Double/Long, so an
        // uncast INT/FLOAT/DECIMAL child would CCE at execution
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{DoubleType, LongType}
        arity("graft_topk", "(score, id, k)", 3, es)
        TopKByScore(Cast(es(0), DoubleType), Cast(es(1), LongType),
          intLit("graft_topk", "k", es(2)))
      }),
    ("graft_heavy_hitters",
      info("graft_heavy_hitters",
        "graft_heavy_hitters(item, capacity) - bounded Misra-Gries frequency summary: struct(total, items array<struct<tok, lb>>)"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.StringType
        arity("graft_heavy_hitters", "(item, capacity)", 2, es)
        // the buffer unboxes UTF8String — an uncast BIGINT item would
        // CCE at execution, the same hazard the topk coercions note
        HeavyHitters(Cast(es(0), StringType),
          intLit("graft_heavy_hitters", "capacity", es(1)))
      }),
    ("graft_bitmap",
      info("graft_bitmap",
        "graft_bitmap(key, maxKey) - exact-distinct bitmap sketch aggregate (binary)"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        arity("graft_bitmap", "(key, maxKey)", 2, es)
        BitmapAgg(Cast(es(0), LongType), intLit("graft_bitmap", "maxKey", es(1)))
      }),
    ("graft_bitmap_union",
      info("graft_bitmap_union",
        "graft_bitmap_union(sketch) - OR-merge aggregate of bitmap sketches (binary)"),
      (es: Seq[Expression]) => {
        arity("graft_bitmap_union", "(sketch)", 1, es); BitmapUnionAgg(es(0))
      }),
    ("graft_bitmap_count",
      info("graft_bitmap_count",
        "graft_bitmap_count(sketch) - cardinality of a bitmap sketch"),
      (es: Seq[Expression]) => {
        arity("graft_bitmap_count", "(sketch)", 1, es); BitmapCount(es(0))
      }),
    ("graft_bitmap64",
      info("graft_bitmap64",
        "graft_bitmap64(key) - exact-distinct SPARSE bitmap sketch aggregate over the full 64-bit key domain (binary)"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        arity("graft_bitmap64", "(key)", 1, es)
        SparseBitmapAgg(Cast(es(0), LongType))
      }),
    ("graft_bitmap64_union",
      info("graft_bitmap64_union",
        "graft_bitmap64_union(sketch) - OR-merge aggregate of sparse bitmap sketches (binary)"),
      (es: Seq[Expression]) => {
        arity("graft_bitmap64_union", "(sketch)", 1, es); SparseBitmapUnionAgg(es(0))
      }),
    ("graft_bitmap64_count",
      info("graft_bitmap64_count",
        "graft_bitmap64_count(sketch) - cardinality of a sparse bitmap sketch"),
      (es: Seq[Expression]) => {
        arity("graft_bitmap64_count", "(sketch)", 1, es); SparseBitmapCount(es(0))
      }),
    ("graft_bitmap64_contains",
      info("graft_bitmap64_contains",
        "graft_bitmap64_contains(sketch, key) - EXACT membership probe against a sparse bitmap sketch"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        arity("graft_bitmap64_contains", "(sketch, key)", 2, es)
        SparseBitmapContains(es(0), Cast(es(1), LongType))
      }),
    ("graft_bloom",
      info("graft_bloom",
        "graft_bloom(key, numBits, numHashes) - mergeable bloom-filter sketch aggregate (binary)"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        arity("graft_bloom", "(key, numBits, numHashes)", 3, es)
        BloomAgg(Cast(es(0), LongType),
          intLit("graft_bloom", "numBits", es(1)),
          intLit("graft_bloom", "numHashes", es(2)))
      }),
    ("graft_bloom_might_contain",
      info("graft_bloom_might_contain",
        "graft_bloom_might_contain(sketch, key, numHashes) - bloom membership probe (no false negatives)"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        arity("graft_bloom_might_contain", "(sketch, key, numHashes)", 3, es)
        BloomMightContain(es(0), Cast(es(1), LongType),
          intLit("graft_bloom_might_contain", "numHashes", es(2)))
      }))

  /** Imperative registration on an existing session (test/driver use). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val registry = castToImpl(spark).sessionState.functionRegistry
    definitions.foreach { case (name, i, builder) =>
      registry.registerFunction(FunctionIdentifier(name), i, builder)
    }
  }
}
