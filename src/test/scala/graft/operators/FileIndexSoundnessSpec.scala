package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** Randomized SOUNDNESS property for [[GraftFileIndex]]'s skipping
  * prover: for thousands of (random file, random predicate) pairs,
  * `admits == false` must imply NO row of the file satisfies the
  * predicate under Catalyst's own evaluation — the one property a
  * data-skipping layer can never violate (a wrong skip silently
  * loses rows; a wrong admit only costs a residual filter). The
  * predicate grammar covers every supported shape — comparisons in
  * both operand orders, In, null checks, And/Or, and arbitrarily
  * nested Not (the r19 neverFalse prover) — plus null values in the
  * data, where SQL three-valued logic is exactly where a hand-rolled
  * prover goes wrong. Seeded, so a failure reproduces.
  */
class FileIndexSoundnessSpec extends SparkSpecBase {

  // fuzz knobs — same contract as the model specs': committed
  // defaults are the suite's cost envelope, a hunt raises them by env
  private val nCases = sys.env.get("SPARK_GRAFT_MODEL_STEPS")
    .flatMap(_.toIntOption).filter(_ >= 1).map(_ * 2000).getOrElse(20000)
  private val seed = sys.env.get("SPARK_GRAFT_MODEL_SEED")
    .flatMap(_.toLongOption).getOrElse(20260816L)

  private val longAttr = AttributeReference("c", LongType)()
  private val strAttr = AttributeReference("t",
    org.apache.spark.sql.types.StringType)()

  /** Catalyst ground truth: bind the single attribute to ordinal 0
    * and evaluate — `true` only when the row SATISFIES (TRUE, not
    * NULL/FALSE), the filter-semantics the skip must honor.
    */
  private def satisfies(e: Expression, v: Any): Boolean = {
    val bound = e.transform {
      case a: AttributeReference => BoundReference(0, a.dataType, nullable = true)
    }
    bound.eval(InternalRow(v)) == true
  }

  /** Stats as statsOf would compute them: non-null (min, max) bounds
    * plus the row count and non-null count the null-check proofs
    * (r20) consume.
    */
  private def statsOfRows(name: String, rows: Seq[Any]): GraftFileIndex.FileStats = {
    val nonNull = rows.filterNot(_ == null)
    val bounds: Map[String, (Any, Any)] =
      if (nonNull.isEmpty) Map(name -> ((null, null)))
      else {
        val longs = nonNull.collect { case l: java.lang.Long => l.longValue() }
        if (longs.nonEmpty)
          Map(name -> ((java.lang.Long.valueOf(longs.min), java.lang.Long.valueOf(longs.max))))
        else {
          val strs = nonNull.collect { case u: UTF8String => u.toString }
          Map(name -> ((strs.min, strs.max)))
        }
      }
    GraftFileIndex.FileStats(bounds, Some(rows.size.toLong),
      Map(name -> nonNull.size.toLong))
  }

  test("admits == false implies no row satisfies, over randomized files and predicates") {
    val rnd = new scala.util.Random(seed)
    def lit(v: Long) = Literal(v, LongType)
    def randLong(): Long = rnd.nextInt(21).toLong - 10
    def randRows(): Seq[Any] = {
      val n = 1 + rnd.nextInt(8)
      Seq.fill(n)(if (rnd.nextInt(6) == 0) null
        else java.lang.Long.valueOf(randLong()))
    }
    def randPred(depth: Int): Expression = {
      val leaf = depth <= 0 || rnd.nextInt(3) == 0
      if (leaf) rnd.nextInt(10) match {
        case 0 => val v = lit(randLong())
          if (rnd.nextBoolean()) EqualTo(longAttr, v) else EqualTo(v, longAttr)
        case 1 => val v = lit(randLong())
          if (rnd.nextBoolean()) GreaterThan(longAttr, v) else GreaterThan(v, longAttr)
        case 2 => val v = lit(randLong())
          if (rnd.nextBoolean()) LessThan(longAttr, v) else LessThan(v, longAttr)
        case 3 => val v = lit(randLong())
          if (rnd.nextBoolean()) GreaterThanOrEqual(longAttr, v)
          else GreaterThanOrEqual(v, longAttr)
        case 4 => val v = lit(randLong())
          if (rnd.nextBoolean()) LessThanOrEqual(longAttr, v)
          else LessThanOrEqual(v, longAttr)
        case 5 => In(longAttr, Seq.fill(1 + rnd.nextInt(3))(lit(randLong())))
        case 6 => IsNotNull(longAttr)
        case 7 => IsNull(longAttr)
        case 8 => // null-safe equality against NULL: satisfied by null rows
          if (rnd.nextBoolean()) EqualNullSafe(longAttr, Literal(null, LongType))
          else EqualNullSafe(Literal(null, LongType), longAttr)
        case _ => val v = lit(randLong())
          if (rnd.nextBoolean()) EqualNullSafe(longAttr, v)
          else EqualNullSafe(v, longAttr)
      } else rnd.nextInt(3) match {
        case 0 => And(randPred(depth - 1), randPred(depth - 1))
        case 1 => Or(randPred(depth - 1), randPred(depth - 1))
        case _ => Not(randPred(depth - 1))
      }
    }
    var skips = 0
    (1 to nCases).foreach { i =>
      val rows = randRows()
      val stats = statsOfRows("c", rows)
      val pred = randPred(3)
      if (!GraftFileIndex.admits(pred, stats)) {
        skips += 1
        rows.foreach { v =>
          assert(!satisfies(pred, v),
            s"UNSOUND SKIP (case $i): $pred skipped a file whose row $v satisfies it " +
              s"(rows=$rows, stats=$stats)")
        }
      }
    }
    // the prover must actually prove things, or the property is vacuous
    assert(skips > nCases / 20,
      s"prover too timid to test: only $skips skips in $nCases cases")
    info(s"$skips/$nCases random (file, predicate) pairs provably skipped — all sound")
  }

  test("string StartsWith proofs stay sound under truncation-shaped bounds") {
    val rnd = new scala.util.Random(4096L)
    def randStr(): UTF8String =
      UTF8String.fromString(Seq.fill(1 + rnd.nextInt(4))(
        ('a' + rnd.nextInt(3)).toChar).mkString)
    (1 to 4000).foreach { i =>
      val rows: Seq[Any] = Seq.fill(1 + rnd.nextInt(6))(
        if (rnd.nextInt(8) == 0) null else randStr())
      val stats = statsOfRows("t", rows)
      val p = Literal(UTF8String.fromString(
        Seq.fill(1 + rnd.nextInt(2))(('a' + rnd.nextInt(3)).toChar).mkString),
        org.apache.spark.sql.types.StringType)
      Seq[Expression](
        StartsWith(strAttr, p),
        Not(StartsWith(strAttr, p)),
        Not(Not(StartsWith(strAttr, p)))).foreach { pred =>
        if (!GraftFileIndex.admits(pred, stats))
          rows.foreach(v => assert(!satisfies(pred, v),
            s"UNSOUND SKIP (case $i): $pred vs rows=$rows stats=$stats row=$v"))
      }
    }
  }
}
