package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale.
  *
  * AQE's skew-join splitting handles most imbalance at runtime; these
  * are the explicit salting paths for the cases it can't reach —
  * a single monster key inside an aggregation, or a join AQE can't
  * split (e.g. a broadcast that doesn't fit).
  *
  * Both transforms are semantics-preserving (spec-verified equal to
  * the unsalted plan) — they only change the exchange layout:
  * `nSalts` × more, smaller partitions for the hot key.
  */
object Skew {

  /** The working column every salted transform appends, guarded like
    * Quantiles' reserved prefix: silently clobbering a caller's
    * `_salt` column (and then dropping it from the output) would be
    * data loss with no error.
    */
  private def requireNoCollision(df: DataFrame, cols: String*): Unit =
    cols.foreach(c => require(!df.columns.contains(c),
      s"input already has a column named '$c' (reserved by Skew's " +
        "salting internals) — rename it first"))

  /** Two-phase salted sum/count: partial aggregate on
    * (keys..., salt), final aggregate on keys. The salt spreads one
    * hot key over `nSalts` reducers; the monoid re-merge (the
    * reference's mergeFn, Processor.hs:49) makes the split sound.
    *
    * The salt comes from a per-row source (partition/row position),
    * NOT from the data: the common skew case is a hot key with
    * constant or low-cardinality values (e.g. counting), where a
    * value-derived salt would be constant too and leave the key on
    * one reducer. The positional source is NONDETERMINISTIC under
    * recompute (a re-run map task deals different salts) — which is
    * exactly why it must stay a Catalyst nondeterministic expression:
    * Spark marks the map stage INDETERMINATE and a fetch failure
    * rolls back and re-runs the WHOLE stage pair instead of mixing
    * attempt outputs (the SPARK-23207 machinery), so rows are never
    * duplicated or lost across a partial recompute. A deterministic
    * hand-rolled salt (hash of row position cached outside Catalyst's
    * knowledge) would silently OPT OUT of that protection.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     nSalts: Int = 16): DataFrame = {
    requireNoCollision(df, "_salt", "_psum", "_pcnt")
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)).as("_salt")
    val partial = df
      .groupBy((keys.map(col) :+ salt): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("_psum").as("sum_value"), sum("_pcnt").as("n"))
  }

  /** Skew join: salt the large side, replicate the small side once
    * per salt, join on (key, salt). Equivalent rows to
    * `large.join(small, key)` with the hot key spread `nSalts` ways.
    * Same indeterminate-stage posture as [[saltedSumCount]].
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 nSalts: Int = 16): DataFrame = {
    requireNoCollision(large, "_salt")
    requireNoCollision(small, "_salt")
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Top frequent keys with their share — the diagnostic that decides
    * whether salting is worth it. ONE scan: the denominator is the
    * sum over the same grouped pass (a separate count() job paid a
    * second scan and could disagree with it on a nondeterministic
    * source, yielding shares that don't sum to ≤ 1).
    */
  def keyHistogram(df: DataFrame, key: Column, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").cast("double").as("_kh_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("_kh_total"), 4))
      .drop("_kh_total")
      .orderBy(col("n").desc)
      .limit(topK)
  }
}
