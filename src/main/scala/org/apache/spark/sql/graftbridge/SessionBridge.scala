package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Narrow bridge into two `private[sql]` session APIs that have no
  * public equivalent, used by [[graft.streaming.Topology.run]] to
  * scope a state-store provider override to ONE streaming query:
  *
  *  - `cloneSession()` — unlike the public `newSession()`, the clone
  *    inherits the parent's RUNTIME conf (and temp views/UDFs), so a
  *    caller's tuned session carries over and only the overlay
  *    differs.
  *  - `Dataset.ofRows` — re-binds an already-wired logical plan to
  *    the clone. Topology spouts may close over DataFrames of the
  *    caller's session (e.g. a MemoryStream), so the plan has to be
  *    transplanted rather than rebuilt.
  *
  * One of the three sanctioned files outside the `graft` namespace
  * (with [[org.apache.spark.sql.graft.ColumnBridge]] and
  * [[org.apache.spark.sql.graft.StreamingShim]] — each a narrow,
  * documented `private[sql]` seam); this one exists so the provider
  * override can live on a private session instead of being
  * set-then-restored on the caller's (which a concurrent query on
  * the same session could capture mid-window).
  */
object SessionBridge {

  /** A full clone of `s` (same SparkContext and shared catalog;
    * copied runtime conf, temp views, UDFs) with `confs` overlaid on
    * the clone only.
    */
  def cloneWithConf(s: SparkSession, confs: (String, String)*): SparkSession = {
    val c = s.asInstanceOf[ClassicSession].cloneSession()
    confs.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** Re-bind `df`'s logical plan to `to` (must share `df`'s
    * SparkContext): the returned frame plans and runs under `to`'s
    * session state/conf.
    */
  def transplant(to: SparkSession, df: DataFrame): DataFrame =
    ClassicDataset.ofRows(to.asInstanceOf[ClassicSession],
      df.asInstanceOf[ClassicDataset[Row]].queryExecution.logical)

  /** A DataFrame over an arbitrary logical plan — used by
    * `MergeTable.readIndexed` to hand Catalyst a `LogicalRelation`
    * wrapping the manifest-backed [[graft.operators.GraftFileIndex]]
    * (the same seam Delta's DeltaLog.createDataFrame rides).
    */
  def ofPlan(s: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    ClassicDataset.ofRows(s.asInstanceOf[ClassicSession], plan)
}
