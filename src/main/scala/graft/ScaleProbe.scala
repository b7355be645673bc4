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
      case "incr" =>
        // dd10's ingest claim, measured: a fixed-size delta batch
        // against a 1× and a 10× persisted fingerprint index. What
        // must stay flat is the SHUFFLE (delta-sized); the index side
        // is an exchange-free, sort-free streamed scan off its
        // buckets, so its cost grows with index BYTES but never
        // re-shuffles or re-sorts the corpus — the naive alternative
        // (re-running dd01 over base+delta) pays a corpus-sized
        // shuffle per batch, also timed here for contrast.
        val deltaRows = 100000L
        val delta = spark.range(deltaRows)
          .select(col("id").as("doc_id"),
            when(col("id") % 2 === 0, md5(concat(lit("doc"), col("id"))))
              .otherwise(md5(concat(lit("new"), col("id")))).as("fp"))
        Seq(rows / 10, rows).foreach { n =>
          val tbl = s"probe_fp_idx_$n"
          spark.sql(s"DROP TABLE IF EXISTS $tbl")
          val path = java.nio.file.Files.createTempDirectory("probe-fpidx").toString
          val t0 = System.nanoTime()
          spark.range(n).select(md5(concat(lit("doc"), col("id"))).as("fp"))
            .write.bucketBy(32, "fp").sortBy("fp").option("path", path)
            .mode("overwrite").format("parquet").saveAsTable(tbl)
          println(f"index build ($n fps): ${(System.nanoTime() - t0) / 1e9}%.2f s")
          val deltaPass = dedup.Dedup.dedupDelta(spark, delta, tbl)
          // new fps = groups the base never touched (min stays ≥ 0;
          // base rows carry doc_id = -1). Matching dd10's output
          // semantics: keep_id = min surviving doc, n_delta = count —
          // the contrast must compute the same answer it is timed
          // against.
          val naive = spark.table(tbl).select(col("fp"), lit(-1L).as("doc_id"))
            .unionAll(delta.select("fp", "doc_id"))
            .groupBy("fp")
            .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_delta"))
            .filter(col("keep_id") >= 0)
          // warm pass: absorb Janino/JIT compilation so the timed
          // runs compare plans, not first-run compilation (the same
          // warm-code/cold-data discipline as Bench)
          Seq(deltaPass, naive).foreach(
            _.write.format("noop").mode("overwrite").save())
          time(s"dd10 delta pass ($deltaRows delta vs $n-fp index)")(deltaPass)
          time(s"naive full re-dedup (base $n + delta)")(naive)
        }
      case "hh" =>
        // q47's claim, measured: exact top-20 frequent keys when the
        // vocabulary grows with the data. ~30% of rows hit 23 hot (23 coprime with the 10-residue gate)
        // keys; the rest are UNIQUE tail keys, so distinct keys ≈
        // 0.7·rows. The exact wordcount shuffles one row per distinct
        // key (vocabulary-sized exchange); the sketch-then-verify
        // plan exchanges ≤ capacity entries per task (pass 1) plus
        // ≤ capacity grouping keys (pass 2) — scan-bound at any
        // vocabulary. Both must return the identical top-20.
        def words(n: Long) = spark.range(n).select(
          when(pmod(col("id"), lit(10)) < 3,
            concat(lit("hot"), pmod(col("id"), lit(23))))
            .otherwise(concat(lit("t"), col("id"))).as("word"))
        Seq(rows / 10, rows).foreach { n =>
          val src = words(n)
          val exact = src.groupBy("word").agg(count(lit(1)).as("cnt"))
            .orderBy(col("cnt").desc, col("word")).limit(20)
          def mgPass(): (DataFrame, Double) = {
            val t0 = System.nanoTime()
            val summary = src
              .agg(functions.GraftFunctions.heavyHitters("word", 4096).as("hh"))
              .head().getStruct(0)
            val cands = summary.getSeq[org.apache.spark.sql.Row](1)
              .map(_.getString(0))
            val out = src.filter(col("word").isin(cands: _*))
              .groupBy("word").agg(count(lit(1)).as("cnt"))
              .orderBy(col("cnt").desc, col("word")).limit(20)
            out.write.format("noop").mode("overwrite").save()
            (out, (System.nanoTime() - t0) / 1e9)
          }
          // warm pass (Janino/JIT), then timed — Bench's discipline
          exact.write.format("noop").mode("overwrite").save()
          mgPass()
          time(s"exact wordcount top-20 ($n rows, ~${(n * 7) / 10} distinct)")(exact)
          val (mgDf, mgSecs) = mgPass()
          println(f"sketch-then-verify top-20 ($n rows): $mgSecs%.2f s")
          val a = exact.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          val b = mgDf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          require(a == b, s"sketch-then-verify diverged from exact:\n$a\n$b")
        }
      case other =>
        System.err.println(s"unknown probe '$other'; use topn | cumsum | incr | hh")
        sys.exit(2)
    }
    spark.stop()
  }
}
