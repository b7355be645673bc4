package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-integrated data skipping for [[MergeTable]]: a
  * [[FileIndex]] whose `listFiles` evaluates the query's pushed-down
  * data filters against the manifest's per-file min/max stats, so a
  * plain `readIndexed(...).filter(col("k") between ...)` prunes files
  * AT PLAN TIME with no explicit scanWhere call — the mechanism
  * Delta's TahoeFileIndex / Iceberg's SparkScan use, built on Spark's
  * own `FileSourceScanExec → FileIndex.listFiles(dataFilters)`
  * pushdown seam (internal-but-stable API, the documented extension
  * point every open table format rides).
  *
  * Soundness contract: a file is SKIPPED only when its stats PROVE no
  * row can match — missing stats, null stats, unsupported predicate
  * shapes, and incomparable types all ADMIT the file and leave the
  * work to the residual filter. Supported shapes: And/Or conjunctions
  * over =, <, <=, >, >=, In, StartsWith on statted columns against
  * literals (either operand order), plus Not over any of those (a
  * `Not(e)` skips a file only when the stats prove EVERY row
  * evaluates `e` to TRUE-or-NULL — see [[GraftFileIndex.neverFalse]];
  * e.g. `NOT (k BETWEEN lo AND hi)` skips files wholly inside the
  * band). A closed BETWEEN itself needs no special case: Catalyst
  * desugars it to the `lo <= a AND a <= hi` pair, whose And-split
  * prunes by interval overlap. IsNull/IsNotNull prune through the
  * manifest's per-file non-null counts (`nn_<c>` vs `n_rows` — the
  * same stats deleteWhere's all-match proof consumes): `nn == n_rows`
  * proves the file has no null (IsNull skips), `nn == 0` proves it
  * has no non-null (IsNotNull skips); a manifest predating the counts
  * admits both, as ever. Everything else is a no-op, never a wrong
  * answer.
  */
final class GraftFileIndex(entries: Seq[GraftFileIndex.Entry])
    extends FileIndex {
  import GraftFileIndex._

  override val rootPaths: Seq[HPath] =
    entries.map(_.status.getPath.getParent).distinct

  override def partitionSchema: StructType = new StructType()

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = entries.map(_.status.getLen).sum

  override def inputFiles: Array[String] =
    entries.map(_.status.getPath.toString).toArray

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val admitted = entries.filter(e => dataFilters.forall(f => admits(f, e.stats)))
    Seq(PartitionDirectory(InternalRow.empty, admitted.map(_.status).toArray))
  }
}

object GraftFileIndex {
  /** One file's skipping evidence: per-column (min, max) bounds over
    * NON-NULL values, plus the row count and per-column non-null
    * counts when the manifest carries them (`n_rows` / `nn_<c>` —
    * absent on pre-r17 manifests, which simply never prove a null
    * check). Bounds and counts are independent proof systems: bounds
    * decide comparisons, counts decide null checks, and the two only
    * meet in EqualNullSafe.
    */
  final case class FileStats(bounds: Map[String, (Any, Any)],
                             nRows: Option[Long] = None,
                             nonNull: Map[String, Long] = Map.empty)

  /** One live data file plus its skipping stats. */
  final case class Entry(status: FileStatus, stats: FileStats)

  private def bound(stats: FileStats, name: String): Option[(Any, Any)] =
    stats.bounds.get(name).filter(t => t._1 != null && t._2 != null)

  /** Counts PROVE the file holds no null in `name`: its non-null
    * count equals the file's row count.
    */
  private def noNulls(st: FileStats, name: String): Boolean =
    st.nRows.exists(n => st.nonNull.get(name).contains(n))

  /** Counts PROVE the file holds no non-null value in `name`. */
  private def noValues(st: FileStats, name: String): Boolean =
    st.nonNull.get(name).contains(0L)

  /** true = the file MAY contain a matching row (keep it). */
  private[operators] def admits(e: Expression,
                                stats: FileStats): Boolean = e match {
    // file-level may-match is compositional: may(l AND r) ⊆ may(l)∧may(r)
    case And(l, r) => admits(l, stats) && admits(r, stats)
    case Or(l, r) => admits(l, stats) || admits(r, stats)
    case EqualTo(a: AttributeReference, Literal(v, _)) => mayContain(stats, a.name, v)
    case EqualTo(Literal(v, _), a: AttributeReference) => mayContain(stats, a.name, v)
    // null-safe equality: against a non-null literal, <=> is satisfied
    // exactly where = is (a null row is FALSE, not NULL — but FALSE
    // doesn't admit either), so the same bounds proof applies; against
    // a NULL literal it's satisfied exactly by null rows, so the
    // non-null counts decide (a file proven null-free skips)
    case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
      if (v == null) !noNulls(stats, a.name) else mayContain(stats, a.name, v)
    case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
      if (v == null) !noNulls(stats, a.name) else mayContain(stats, a.name, v)
    case GreaterThan(a: AttributeReference, Literal(v, _)) =>
      bound(stats, a.name).forall { case (_, mx) => cmp(mx, v).forall(_ > 0) }
    case GreaterThan(Literal(v, _), a: AttributeReference) => // v > a ≡ a < v
      bound(stats, a.name).forall { case (mn, _) => cmp(mn, v).forall(_ < 0) }
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      bound(stats, a.name).forall { case (_, mx) => cmp(mx, v).forall(_ >= 0) }
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      bound(stats, a.name).forall { case (mn, _) => cmp(mn, v).forall(_ <= 0) }
    case LessThan(a: AttributeReference, Literal(v, _)) =>
      bound(stats, a.name).forall { case (mn, _) => cmp(mn, v).forall(_ < 0) }
    case LessThan(Literal(v, _), a: AttributeReference) =>
      bound(stats, a.name).forall { case (_, mx) => cmp(mx, v).forall(_ > 0) }
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      bound(stats, a.name).forall { case (mn, _) => cmp(mn, v).forall(_ <= 0) }
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      bound(stats, a.name).forall { case (_, mx) => cmp(mx, v).forall(_ >= 0) }
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(l => mayContain(stats, a.name, l.asInstanceOf[Literal].value))
    case StartsWith(a: AttributeReference, Literal(v, _)) =>
      // keys with prefix p live in [p, p + maxChar): p <= max && min < p-successor
      bound(stats, a.name).forall { case (mn, mx) =>
        val p = String.valueOf(norm(v))
        (norm(mx), norm(mn)) match {
          case (sx: String, sn: String) =>
            sx.compareTo(p) >= 0 && sn.compareTo(p + "￿") <= 0
          case _ => true
        }
      }
    // null checks prune through the non-null counts: IsNull is
    // satisfied only by null rows (skip when nn == n_rows proves
    // there are none), IsNotNull only by non-null rows (skip when
    // nn == 0 proves there are none); a manifest without the counts
    // proves neither and admits — the missing-stats posture
    case IsNull(a: AttributeReference) => !noNulls(stats, a.name)
    case IsNotNull(a: AttributeReference) => !noValues(stats, a.name)
    case IsNotNull(_) => true // null check over a non-column shape: admit
    case IsNull(_) => true
    // Not(e) is satisfied only by rows where e evaluates FALSE
    // (Not(NULL) = NULL, which a filter drops) — skip iff the stats
    // prove no row can evaluate e to FALSE
    case Not(inner) => !neverFalse(inner, stats)
    case _ => true // unsupported shape: admit, residual filter decides
  }

  /** true iff the stats PROVE no row in the file evaluates `e` to
    * FALSE — every row is TRUE or NULL under SQL three-valued logic —
    * which is exactly the condition under which `Not(e)` can never be
    * satisfied (Not(TRUE)=FALSE, Not(NULL)=NULL; only FALSE survives
    * the filter as TRUE). NULL operands never threaten soundness: a
    * comparison on a null value evaluates NULL, which this predicate
    * tolerates, so min/max bounds (computed over non-null values) are
    * sufficient evidence. Conservative by construction — `false`
    * whenever unprovable, which makes the caller ADMIT the file.
    */
  private[operators] def neverFalse(e: Expression,
                                    stats: FileStats): Boolean = e match {
    case And(l, r) => neverFalse(l, stats) && neverFalse(r, stats) // FALSE iff either side FALSE
    case Or(l, r) => neverFalse(l, stats) || neverFalse(r, stats) // FALSE iff both sides FALSE
    // Not(x) is FALSE iff x is TRUE; admits() over-approximates
    // "∃ row where x is TRUE", so its negation proves none exists
    case Not(inner) => !admits(inner, stats)
    case EqualTo(a: AttributeReference, Literal(v, _)) => allEqual(stats, a.name, v)
    case EqualTo(Literal(v, _), a: AttributeReference) => allEqual(stats, a.name, v)
    // <=> never evaluates NULL, so it is FALSE wherever it isn't TRUE:
    // against NULL it's TRUE exactly on null rows (neverFalse iff the
    // file is all-null); against a value it additionally needs the
    // file null-free (a null row makes <=> FALSE where = made it NULL)
    case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
      if (v == null) noValues(stats, a.name)
      else allEqual(stats, a.name, v) && noNulls(stats, a.name)
    case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
      if (v == null) noValues(stats, a.name)
      else allEqual(stats, a.name, v) && noNulls(stats, a.name)
    // IsNull is FALSE exactly on non-null rows; IsNotNull on null rows
    case IsNull(a: AttributeReference) => noValues(stats, a.name)
    case IsNotNull(a: AttributeReference) => noNulls(stats, a.name)
    case GreaterThan(a: AttributeReference, Literal(v, _)) => // FALSE iff a <= v
      bound(stats, a.name).exists { case (mn, _) => cmp(mn, v).exists(_ > 0) }
    case GreaterThan(Literal(v, _), a: AttributeReference) => // v > a ≡ a < v
      bound(stats, a.name).exists { case (_, mx) => cmp(mx, v).exists(_ < 0) }
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      bound(stats, a.name).exists { case (mn, _) => cmp(mn, v).exists(_ >= 0) }
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => // v >= a ≡ a <= v
      bound(stats, a.name).exists { case (_, mx) => cmp(mx, v).exists(_ <= 0) }
    case LessThan(a: AttributeReference, Literal(v, _)) => // FALSE iff a >= v
      bound(stats, a.name).exists { case (_, mx) => cmp(mx, v).exists(_ < 0) }
    case LessThan(Literal(v, _), a: AttributeReference) => // v < a ≡ a > v
      bound(stats, a.name).exists { case (mn, _) => cmp(mn, v).exists(_ > 0) }
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      bound(stats, a.name).exists { case (_, mx) => cmp(mx, v).exists(_ <= 0) }
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => // v <= a ≡ a >= v
      bound(stats, a.name).exists { case (mn, _) => cmp(mn, v).exists(_ >= 0) }
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      // provable only through a constant column: min == max == some
      // member (a general subset proof needs value-level stats)
      vs.exists(l => allEqual(stats, a.name, l.asInstanceOf[Literal].value))
    case StartsWith(a: AttributeReference, Literal(v, _)) =>
      // min and max share the prefix → every string lexicographically
      // between them does too
      bound(stats, a.name).exists { case (mn, mx) =>
        val p = String.valueOf(norm(v))
        (norm(mn), norm(mx)) match {
          case (sn: String, sx: String) => sn.startsWith(p) && sx.startsWith(p)
          case _ => false
        }
      }
    case _ => false // unprovable shape: admit upstream
  }

  /** Stats prove every non-null value equals `v`: min == max == v. */
  private def allEqual(stats: FileStats, name: String, v: Any): Boolean =
    bound(stats, name).exists { case (mn, mx) =>
      cmp(mn, v).contains(0) && cmp(mx, v).contains(0)
    }

  private def mayContain(stats: FileStats,
                         name: String, v: Any): Boolean =
    bound(stats, name).forall { case (mn, mx) =>
      cmp(mn, v).forall(_ <= 0) && cmp(mx, v).forall(_ >= 0)
    }

  /** Total-order compare of a stats value against a literal's internal
    * value; None (→ admit) when types don't line up or a value is not
    * orderable (NaN, exotic types).
    */
  private def cmp(statVal: Any, litVal: Any): Option[Int] =
    (norm(statVal), norm(litVal)) match {
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
        Some(x.compareTo(y))
      case (x: String, y: String) => Some(x.compareTo(y))
      case _ => None
    }

  private def norm(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case s: String => s
    case d: java.lang.Double if d.isNaN || d.isInfinite => v
    case f: java.lang.Float if f.isNaN || f.isInfinite => v
    case n @ (_: java.lang.Long | _: Integer | _: java.lang.Short |
              _: java.lang.Byte | _: java.lang.Double | _: java.lang.Float) =>
      new java.math.BigDecimal(n.toString)
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    // Date/timestamp stats arrive as collect()-external values
    // (java.sql.Date/Timestamp, or java.time with the java8 API conf)
    // while the Catalyst literal's internal value is Int epoch-days /
    // Long epoch-micros — normalize both sides to the internal scale
    // so date-banded filters actually prune instead of always
    // admitting. Spark's own converters handle the proleptic-Gregorian
    // rebase these externals need.
    case d: java.sql.Date =>
      new java.math.BigDecimal(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d))
    case d: java.time.LocalDate => new java.math.BigDecimal(d.toEpochDay)
    case t: java.sql.Timestamp =>
      new java.math.BigDecimal(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant =>
      new java.math.BigDecimal(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i))
    case ldt: java.time.LocalDateTime =>
      new java.math.BigDecimal(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(ldt))
    case other => other
  }
}
