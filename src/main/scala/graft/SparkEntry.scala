package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's flagship workload: tokenize → keyed
    * count → top-N (WordCountSample.hs), batch form.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01_wordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.registry ++
      operators.MergeTable.registry ++
      text.TextAnalysis.registry ++
      dedup.Dedup.registry ++
      similarity.Similarity.registry ++
      multimodal.Multimodal.registry ++
      pipeline.Pipeline.registry ++
      graph.PageRank.registry

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.MergeTable.oracles ++
      text.TextAnalysis.oracles ++
      dedup.Dedup.oracles ++
      similarity.Similarity.oracles ++
      multimodal.Multimodal.oracles ++
      pipeline.Pipeline.oracles ++
      graph.PageRank.oracles
}
