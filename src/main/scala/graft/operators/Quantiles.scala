package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT interpolated quantiles (quantile_cont semantics).
  *
  * Spark's built-in `percentile` buffers a value→count map per group:
  * exact and fine for bounded-cardinality inputs (l_quantity, token
  * counts), but on a high-cardinality double (l_extendedprice) the
  * buffer is the group's full distinct-value set on one reducer — the
  * classic 100 TB blow-up. The equally classic fix is selection from
  * a distributed sort:
  *
  *   1. range-partition (key, value) into `nParts` ORDERED buckets —
  *      a global sort whose per-task memory is n/nParts, not n/groups;
  *   2. per-(bucket, key) row counts → each bucket's rank offset via a
  *      running sum over the tiny (nParts × |keys|)-row count table;
  *   3. per-bucket `row_number` + offset = exact global rank within
  *      the key (the window partitions by (bucket, key), so no sort
  *      ever concentrates a whole group on one task);
  *   4. keep the floor/ceil ranks of pos = q·(n−1) and interpolate —
  *      the same continuous-quantile formula as Spark `percentile`
  *      and DuckDB `quantile_cont`.
  *
  * The range-partitioned projection is pinned with an eager
  * `localCheckpoint`: the count pass and the rank pass MUST observe
  * the same bucket boundaries, and RangePartitioner re-samples (with
  * fresh RDD-id-derived seeds) on every materialization — two
  * independent executions could disagree on bounds and silently
  * mis-rank. The pinned data is a narrow (key, value, bucket) row, so
  * the materialization is the cheapest possible snapshot of the sort.
  *
  * Intended for low-cardinality keys over huge groups — exactly where
  * `percentile` breaks. High-cardinality keys mean small groups, where
  * the built-in buffer is the right tool.
  */
object Quantiles {

  // Internal working columns carry this prefix so a caller's key
  // column can't collide with them (key = "v" or "q" previously
  // produced wrong resolution / confusing analysis errors).
  private val P = "__gq_"

  /** One exact interpolated quantile of `value` per `key` group.
    * Returns (key, q_value). See object doc for the plan shape.
    */
  def groupQuantile(df: DataFrame, key: String, value: String, q: Double,
                    nParts: Int = 32): DataFrame =
    groupQuantiles(df, key, value, Seq(q), nParts)
      .select(col(key), col("q_value"))

  /** Several exact interpolated quantiles per `key` group in ONE
    * sort pass — the data is ranked once and every requested quantile
    * selects its own floor/ceil ranks from it. Returns
    * (key, q, q_value), one row per (group, quantile).
    */
  def groupQuantiles(df: DataFrame, key: String, value: String, qs: Seq[Double],
                     nParts: Int = 32): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles out of range: $qs")
    require(key != "q" && key != "q_value" && !key.startsWith(P),
      s"key column '$key' collides with the output schema (key, q, q_value)")
    val k: Column = col(key)
    // null VALUES are excluded, matching percentile/quantile_cont:
    // unfiltered they'd sort first and shift every rank. (An all-null
    // group thus has no output row, where the aggregates return NULL.)
    // Null KEYS are a group like any other — see the null-safe joins
    // below.
    val data = df
      .select(k, col(value).cast("double").as(s"${P}v"))
      .filter(col(s"${P}v").isNotNull)
      .repartitionByRange(nParts, k, col(s"${P}v"))
      .withColumn(s"${P}bkt", spark_partition_id())
      .localCheckpoint(true) // pin bucket bounds across the two passes
    val counts = data.groupBy(col(s"${P}bkt"), k).agg(count(lit(1)).as(s"${P}c"))
    // rank offset of each bucket within its key = rows in earlier buckets
    val wOff = Window.partitionBy(k).orderBy(s"${P}bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn(s"${P}off", coalesce(sum(s"${P}c").over(wOff), lit(0L)))
      .select(col(s"${P}bkt"), k, col(s"${P}off"))
    // per (key, q) target ranks: pos = q·(n−1) zero-indexed →
    // 1-indexed floor/ceil rows
    val targets = counts.groupBy(k).agg(sum(s"${P}c").as(s"${P}n"))
      .withColumn(s"${P}q", explode(lit(qs.toArray)))
      .withColumn(s"${P}pos", col(s"${P}q") * (col(s"${P}n") - 1).cast("double"))
      .withColumn(s"${P}rank_lo", floor(col(s"${P}pos")).cast("long") + 1)
      .withColumn(s"${P}rank_hi",
        least(ceil(col(s"${P}pos")).cast("long") + 1, col(s"${P}n")))
      .withColumn(s"${P}frac", col(s"${P}pos") - floor(col(s"${P}pos")))
      .select(k, col(s"${P}q"), col(s"${P}rank_lo"), col(s"${P}rank_hi"),
        col(s"${P}frac"))
    val wRank = Window.partitionBy(col(s"${P}bkt"), k).orderBy(s"${P}v")
    // NULL-SAFE key joins: a null key is a group like any other under
    // groupBy (and under percentile/quantile_cont, which emit a row
    // for it) — a USING join here would silently drop every null-key
    // row and lose the group's quantiles entirely. <=> is a valid
    // hash-join key, so the broadcasts stay broadcasts.
    val offsetsR = offsets.select(col(s"${P}bkt").as(s"${P}obkt"),
      k.as(s"${P}okey"), col(s"${P}off"))
    val targetsR = targets.select(k.as(s"${P}tkey"), col(s"${P}q"),
      col(s"${P}rank_lo"), col(s"${P}rank_hi"), col(s"${P}frac"))
    data.withColumn(s"${P}rn", row_number().over(wRank).cast("long"))
      .join(broadcast(offsetsR),
        col(s"${P}bkt") === col(s"${P}obkt") && (k <=> col(s"${P}okey")))
      .withColumn(s"${P}grank", col(s"${P}off") + col(s"${P}rn"))
      .join(broadcast(targetsR), k <=> col(s"${P}tkey"))
      .filter(col(s"${P}grank") === col(s"${P}rank_lo") ||
        col(s"${P}grank") === col(s"${P}rank_hi"))
      // ≤ 2 surviving rows per (key, q); frac is (key, q)-constant
      .groupBy(k, col(s"${P}q"), col(s"${P}frac"))
      .agg(
        max(when(col(s"${P}grank") === col(s"${P}rank_lo"), col(s"${P}v")))
          .as(s"${P}lo"),
        max(when(col(s"${P}grank") === col(s"${P}rank_hi"), col(s"${P}v")))
          .as(s"${P}hi"))
      .select(k, col(s"${P}q").as("q"),
        (col(s"${P}lo") + col(s"${P}frac") * (col(s"${P}hi") - col(s"${P}lo")))
          .as("q_value"))
  }
}
