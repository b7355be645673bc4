package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off scale-experiment driver backing PLANS.md's measured
  * claims: synthetic data well past bench SF, timing the scale-honest
  * plan against the naive formulation it replaces.
  *
  *   ScaleProbe topn   [rows] — q43's bounded-heap aggregate vs q03's
  *                              row_number window, same semantics
  *   ScaleProbe cumsum [rows] — pp04's range-partitioned global
  *                              cumsum vs the single-partition window
  *
  * Results are recorded in PLANS.md §"R4 scale probes"; re-run any
  * time with `tools/run.sh graft.ScaleProbe <probe> [rows]`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val probe = args.headOption.getOrElse("topn")
    val rows = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    probe match {
      case "topn" =>
        // 20 groups, unique ids, deterministic hash scores
        val src = spark.range(rows)
          .select(pmod(col("id"), lit(20)).as("grp"),
            (pmod(xxhash64(col("id")), lit(1000000)) / lit(1000.0)).as("score"),
            col("id"))
        val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
        time(s"window row_number top-5 ($rows rows)")(
          src.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
            .select("grp", "id", "score", "rn"))
        time(s"graft_topk heap top-5 ($rows rows)")(
          src.groupBy("grp")
            .agg(functions.GraftFunctions.topK("score", "id", 5).as("top"))
            .select(col("grp"), posexplode(col("top"))))
      case "cumsum" =>
        val src = spark.range(rows)
          .select(col("id").as("doc_id"),
            pmod(xxhash64(col("id")), lit(1000)).as("n"))
        val wAll = Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        time(s"single-partition window cumsum ($rows rows)")(
          src.withColumn("cum", sum("n").over(wAll)))
        // pp04's ACTUAL plan — the shared implementation, so the
        // measurement can't drift from the shipped code
        time(s"range-partitioned cumsum ($rows rows, incl. checkpoint)")(
          pipeline.Pipeline.globalCumSum(src, cpus.toInt))
      case other =>
        System.err.println(s"unknown probe '$other'; use topn | cumsum")
        sys.exit(2)
    }
    spark.stop()
  }
}
