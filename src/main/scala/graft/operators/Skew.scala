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

  /** Two-phase salted sum/count: partial aggregate on
    * (keys..., salt), final aggregate on keys. The salt spreads one
    * hot key over `nSalts` reducers; the monoid re-merge (the
    * reference's mergeFn, Processor.hs:49) makes the split sound.
    *
    * The salt comes from a per-row source (partition/row position),
    * NOT from the data: the common skew case is a hot key with
    * constant or low-cardinality values (e.g. counting), where a
    * value-derived salt would be constant too and leave the key on
    * one reducer.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     nSalts: Int = 16): DataFrame = {
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
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 nSalts: Int = 16): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Top frequent keys with their share — the diagnostic that decides
    * whether salting is worth it.
    */
  def keyHistogram(df: DataFrame, key: Column, topK: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / lit(total.toDouble), 4))
      .orderBy(col("n").desc)
      .limit(topK)
  }
}
