package graft.pipeline

import graft.Tables
import graft.text.TextAnalysis.{normText, toksExpr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2 composite: the end-to-end corpus-cleaning pass a training-data
  * pipeline runs — quality filter + stopword-density filter + exact
  * dedup keep-list — composed from the §2.2/§2.4 operators in ONE
  * declarative plan (scan once, no materialization between stages).
  *
  * At 100 TB this is a single narrow-dependency projection/filter
  * chain plus one hash shuffle for the dedup groupBy — the minimum
  * possible for these semantics.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  val pp01_clean_corpus: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), expr(toksExpr).as("t"))
      .select(col("doc_id"),
        md5(normText(col("text")).cast("binary")).as("fp"),
        size(col("t")).cast("long").as("n_tokens"),
        (expr("size(filter(t, x -> x IN ('the','a','an','of','and','to','in','is')))")
          .cast("double") / size(col("t"))).as("stop_ratio"))
    val keep = scored.groupBy("fp").agg(min("doc_id").as("keep_id"))
    scored.join(keep, Seq("fp"))
      .filter(col("doc_id") === col("keep_id") &&
        col("n_tokens") >= 20 && col("stop_ratio") >= 0.01)
      .select("doc_id", "n_tokens")
      .orderBy("doc_id")
  }

  val registry: Map[String, Q] = Map("pp01_clean_corpus" -> pp01_clean_corpus)

  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '')"

  val oracles: Map[String, String] = Map(
    "pp01_clean_corpus" ->
      s"""WITH scored AS (
         |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         |    len(t) AS n_tokens,
         |    CAST(len(list_filter(t, x -> x IN ('the','a','an','of','and','to','in','is'))) AS DOUBLE)
         |      / len(t) AS stop_ratio
         |  FROM (SELECT doc_id, text, $sqlToks AS t FROM documents) x),
         |keep AS (SELECT fp, min(doc_id) AS keep_id FROM scored GROUP BY fp)
         |SELECT doc_id, n_tokens FROM scored JOIN keep USING (fp)
         |WHERE doc_id = keep_id AND n_tokens >= 20 AND stop_ratio >= 0.01
         |ORDER BY doc_id""".stripMargin)
}
