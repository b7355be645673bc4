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
  *   ScaleProbe incr   [rows] — dd10's delta-batch index dedup vs
  *                              re-deduping the whole corpus
  *   ScaleProbe hh     [rows] — q47's sketch-then-verify vs the
  *                              vocabulary-sized exact wordcount
  *   ScaleProbe pq     [rows] — ann05's 8-byte ADC scan vs the exact
  *                              dot scan over raw vectors
  *   ScaleProbe bloom  [rows] — q53's bloom-pruned semi join vs
  *                              sort-merge on an unbroadcastable dim
  *   ScaleProbe skew   [rows] — salted join vs AQE skew-split vs
  *                              static SMJ on a 30%-hot key
  *   ScaleProbe tri    [rows] — pr02's degree-ordered triangle
  *                              orientation vs id-ordered on a hub
  *   ScaleProbe tripin [rows] — pr02's pinned `oriented` subtree vs
  *                              recomputing the degree joins on both
  *                              wedge sides (same graph as `tri`)
  *   ScaleProbe pr     [rows] — pr01's checkpoint cadence (1/3/10)
  *   ScaleProbe bitmap64 [rows] — q58's sparse-sketch rollup table vs
  *                              re-aggregating the facts per level
  *   ScaleProbe mm04hot [rows [hot]] — the shipped band join (AQE
  *                              on/off) vs the chunk-spread remedy on
  *                              a near-constant corpus (one hot band)
  *   ScaleProbe restoreclone [rows] — q67/q68's O(manifest) restore +
  *                              shallow clone vs the O(table) deep copy
  *   ScaleProbe bloommaint [rows] — the bloom sidecar's delta-sized
  *                              fold at merge commits vs the full
  *                              rebuild it avoids; candidates must
  *                              stay ~1/64 across a merge diet
  *   ScaleProbe knnjoin [rows] — ann09's blocked k-NN self-join:
  *                              candidate volume and wall across a 4×
  *                              corpus jump at bounded cell occupancy
  *                              (linear, vs the n² brute it replaces)
  *   ScaleProbe lshincr [rows] — dd11's per-batch probe + append
  *                              against a 1× and a 10× LSH posting
  *                              store on MergeTable: append must stay
  *                              ~flat (batch + manifest sized), probe
  *                              grows only with the index SCAN
  *   ScaleProbe statskip [rows] — IS NULL + StartsWith file skipping
  *                              (nn-count / string-stats proofs) vs
  *                              the full-scan contrast at 1/4× and 1×
  *   ScaleProbe dd11bulk [_ [sfDir]] — the registered dd11 row's
  *                              bulk 20%-corpus replay: shipped SMJ
  *                              vs raised broadcast threshold vs an
  *                              explicit delta-broadcast hint
  *   ScaleProbe build [docs] — the CLI `build` capstone end to end
  *                              (raw documents → committed curated
  *                              shards) at 1× and 10×: the composed
  *                              path must stay ~linear, with no stage
  *                              re-introducing a corpus-sized driver
  *                              step
  *   ScaleProbe ckpt [commits] — commit-log checkpoint rollups:
  *                              committedGen/reflectedGen flat across
  *                              a 100x generation-count jump vs the
  *                              O(commits) listing/walk contrast
  *
  * Results are recorded in PLANS.md's scale-probe tables; re-run any
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
      case "pq" =>
        // ann05's 100 TB claim, measured: top-k scoring from the
        // 8-byte PQ code column vs from the raw 64-dim double
        // vectors, both heap-selected, both cold off parquet. The
        // code layout is ~64x smaller on disk, so the ADC scan is
        // IO-bound-cheaper by roughly that factor once the corpus
        // outgrows the page cache; CPU/row is also lower (16 table
        // lookups vs 64 multiply-adds).
        val dim = 64
        val base = java.nio.file.Files.createTempDirectory("probe-pq").toString
        try {
          // deterministic synthetic vectors: 32 loose clusters + hash noise
          val raw = spark.range(rows).select(col("id").as("vec_id"),
            expr(s"""transform(sequence(0, ${dim - 1}, 1), i ->
              cast(pmod(xxhash64(pmod(id, 32), i), 1000) as double) / 500.0 - 1.0 +
              cast(pmod(xxhash64(id, i), 200) as double) / 1000.0)""").as("v"))
            .withColumn("nrm", functions.GraftFunctions.l2norm("v"))
          raw.write.mode("overwrite").parquet(s"$base/raw")
          val vdf = spark.read.parquet(s"$base/raw")
          val books = similarity.Similarity.trainPqBooksOf(vdf)
          vdf.select(col("vec_id"), functions.GraftFunctions
              .pqEncode("v", books, similarity.Similarity.pqBits).as("code"))
            .write.mode("overwrite").parquet(s"$base/codes")
          def bytesOf(p: String): Long = {
            import scala.jdk.CollectionConverters._
            val walk = java.nio.file.Files.walk(java.nio.file.Path.of(p))
            try walk.iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_))
              .map(java.nio.file.Files.size).sum
            finally walk.close()
          }
          println(f"raw layout:  ${bytesOf(s"$base/raw") / 1e6}%.1f MB; " +
            f"code layout: ${bytesOf(s"$base/codes") / 1e6}%.1f MB " +
            f"(${bytesOf(s"$base/raw").toDouble / bytesOf(s"$base/codes")}%.0fx)")
          // 10 fixed queries, both paths
          val qs = vdf.filter(col("vec_id") < 10).collect()
            .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
          val luts = qs.map { case (_, va, na) =>
            similarity.Similarity.pqLutFor(books,
              if (na > 0.0) va.map(_ / na) else va)
          }
          val qIds = qs.map(_._1)
          time(s"exact dot scan + heap top-5 ($rows rows)") {
            val qdf = spark.createDataFrame(
              spark.sparkContext.parallelize(qs.toSeq.map(q =>
                org.apache.spark.sql.Row(q._1, q._2.toSeq, q._3)), 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("q_id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("va",
                  org.apache.spark.sql.types.ArrayType(
                    org.apache.spark.sql.types.DoubleType)),
                org.apache.spark.sql.types.StructField("na",
                  org.apache.spark.sql.types.DoubleType))))
            spark.read.parquet(s"$base/raw")
              .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nb"))
              .join(broadcast(qdf), col("q_id") =!= col("n_id"))
              .select(col("q_id"), col("n_id"),
                (functions.GraftFunctions.dot("va", "vb") /
                  (col("na") * col("nb"))).as("cos"))
              .groupBy("q_id")
              .agg(functions.GraftFunctions.topK("cos", "n_id", 5).as("tk"))
          }
          time(s"PQ ADC scan + heap top-5 ($rows rows)") {
            spark.read.parquet(s"$base/codes")
              .select(col("vec_id").as("n_id"), posexplode(
                functions.GraftFunctions.pqAdcScores("code", luts,
                  similarity.Similarity.pqM, similarity.Similarity.pqKsub,
                  similarity.Similarity.pqBits)).as(Seq("qi", "adc")))
              .withColumn("q_id", element_at(typedlit(qIds), col("qi") + 1))
              .filter(col("q_id") =!= col("n_id"))
              .groupBy("q_id")
              .agg(functions.GraftFunctions.topK("adc", "n_id", 40).as("tk"))
          }
        } finally IndexLifecycle.deleteRecursively(base)
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
      case "bloom" =>
        // q53's claim, measured: semi join when the dim key set is
        // too big to broadcast as a hash table (5M keys) but fits a
        // bloom (2^26 bits = 8 MB). Facts hit the dim at ~2%
        // (uniform keys over 50x the dim domain). The baseline
        // shuffles ALL fact rows + the dim into a sort-merge semi
        // join; the bloom path pre-filters facts with the codegen'd
        // probe so only ~2% + fp reach the exchange. Both must
        // produce the identical match count.
        val nDim = 5000000L
        val domain = nDim * 50
        val dim = spark.range(nDim).select(col("id").as("k"))
        def facts(n: Long) = spark.range(n)
          .select(pmod(xxhash64(col("id")), lit(domain)).as("k"))
        // keep the baseline honest: no broadcast of the 5M-row dim
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        Seq(rows / 10, rows).foreach { n =>
          val src = facts(n)
          val exact = src.join(dim, Seq("k"), "left_semi").agg(count(lit(1)).as("n"))
          exact.write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          val exactN = exact.head().getLong(0)
          println(f"sort-merge semi join ($n rows, 5M-key dim): ${(System.nanoTime() - t0) / 1e9}%.2f s")
          val t1 = System.nanoTime()
          val bloom = dim
            .agg(functions.GraftFunctions.bloomAgg("k", 1 << 26, 5).as("bf"))
            .head().getAs[Array[Byte]](0)
          val tBuild = (System.nanoTime() - t1) / 1e9
          val pruned = src
            .filter(functions.GraftFunctions.bloomMightContain("k", bloom, 5))
            .join(dim, Seq("k"), "left_semi").agg(count(lit(1)).as("n"))
          pruned.write.format("noop").mode("overwrite").save() // warm
          val t2 = System.nanoTime()
          val prunedN = pruned.head().getLong(0)
          println(f"bloom-pruned semi join ($n rows): ${(System.nanoTime() - t2) / 1e9}%.2f s (+ $tBuild%.2f s one-time build)")
          require(exactN == prunedN,
            s"bloom-pruned count $prunedN != exact $exactN")
          // EXACT sketch pruning: the dim's CONTIGUOUS key range makes
          // its bitmap64 sketch run-container tiny, and exact
          // membership means the filter IS the semi join — no join
          // operator behind it at all (bloom still needs the exact
          // join to clear its false positives)
          val t3 = System.nanoTime()
          val sketch = dim
            .agg(functions.GraftFunctions.bitmap64Agg("k").as("sk"))
            .head().getAs[Array[Byte]](0)
          val tSk = (System.nanoTime() - t3) / 1e9
          val viaSketch = src
            .filter(functions.GraftFunctions.bitmap64Contains("k", sketch))
            .agg(count(lit(1)).as("n"))
          viaSketch.write.format("noop").mode("overwrite").save() // warm
          val t4 = System.nanoTime()
          val sketchN = viaSketch.head().getLong(0)
          println(f"exact bitmap64 filter, NO join ($n rows, ${sketch.length / 1e3}%.1f KB sketch): ${(System.nanoTime() - t4) / 1e9}%.2f s (+ $tSk%.2f s one-time build)")
          require(exactN == sketchN,
            s"bitmap64-filtered count $sketchN != exact $exactN")
        }
      case "skew" =>
        // Skew's claim, measured: a join where ONE key carries ~30%
        // of the fact side. Three plans over identical data: the
        // static sort-merge join (AQE off — what a naive config
        // runs), AQE's runtime skew-split, and the explicit salted
        // join (the path for cases AQE can't split). All three must
        // agree on the row count.
        val nDim2 = 1000000L
        val dim2 = spark.range(nDim2)
          .select(col("id").as("k"), (col("id") * 2).as("w"))
        def skewed(nr: Long) = spark.range(nr).select(
          when(pmod(xxhash64(col("id")), lit(10)) < 3, lit(0L))
            .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(nDim2))).as("k"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        Seq(rows / 10, rows).foreach { n =>
          val src = skewed(n)
          def joined = src.join(dim2, Seq("k")).agg(count(lit(1)).as("n"))
          def run(label: String, aqe: Boolean)(df: => org.apache.spark.sql.DataFrame): Long = {
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)
            df.write.format("noop").mode("overwrite").save() // warm
            val t0 = System.nanoTime()
            val c = df.head().getLong(0)
            println(f"$label ($n rows): ${(System.nanoTime() - t0) / 1e9}%.2f s")
            c
          }
          val a = run("static sort-merge join, AQE off", aqe = false)(joined)
          val b = run("AQE skew-split join", aqe = true)(joined)
          val c = run("salted join (16 salts)", aqe = false)(
            operators.Skew.saltedJoin(src, dim2, "k").agg(count(lit(1)).as("n")))
          spark.conf.set("spark.sql.adaptive.enabled", true)
          require(a == b && b == c, s"skew variants disagree: $a / $b / $c")
        }
      case "tri" =>
        // pr02's claim, measured: a ring graph (every node in a few
        // local triangles) plus ONE celebrity node adjacent to `hub`
        // others. Orienting edges by node ID gives the celebrity
        // out-degree `hub`, so the wedge self-join generates
        // hub²/2 candidates from that one node; orienting by DEGREE
        // points every celebrity edge inward and bounds its
        // out-degree at 0. Same result set, wildly different join
        // volume — the difference IS the orientation.
        val nRing = rows
        val hub = 20000L
        val ring = spark.range(1L, nRing).select(col("id").as("a"), (col("id") + 1).as("b"))
          .unionAll(spark.range(1L, nRing - 1)
            .select(col("id").as("a"), (col("id") + 2).as("b")))
        val celeb = spark.range(1L, hub + 1).select(lit(0L).as("a"), col("id").as("b"))
        val edges = ring.unionAll(celeb).distinct().localCheckpoint()
        def wedgeCount(oriented: DataFrame): Long = {
          val w = oriented.as("e1").join(oriented.as("e2"),
              col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
            .select(col("e1.dst").as("a"), col("e2.dst").as("b"))
          w.join(edges, Seq("a", "b")).count()
        }
        def time2(label: String)(f: => Long): Long = {
          val t0 = System.nanoTime()
          val c = f
          println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c triangles)")
          c
        }
        val byId = edges.select(col("a").as("src"), col("b").as("dst")) // a<b already
        val x = time2(s"id-oriented wedge join ($nRing-ring + $hub-degree hub)")(wedgeCount(byId))
        val t0 = System.nanoTime()
        val deg = graph.PageRank.triangleCounts(edges)
          .agg(sum("n_triangles")).head().getLong(0)
        println(f"degree-oriented (pr02's plan): ${(System.nanoTime() - t0) / 1e9}%.2f s (${deg / 3} triangles)")
        require(x == deg / 3, s"orientations disagree: $x vs ${deg / 3}")
      case "lshincr" =>
        // the migration's scale posture, measured: per-batch cost on a
        // MergeTable-backed posting store. The delta (fixed 10k docs)
        // broadcasts, so the index side carries zero exchanges; the
        // probe's only index-proportional cost is the narrow posting
        // SCAN (both the old bucketed layout and this one pay it — a
        // band join consults every band bucket), and the append +
        // manifest resolution must stay flat across a 10× index.
        def synth(lo: Long, hi: Long) = spark.range(lo, hi)
          .select(col("id").as("doc_id"),
            concat_ws(" ", (1 to 12).map(j =>
              concat(lit(s"w$j"), pmod(xxhash64(col("id") * 31 + j), lit(5000)))): _*)
              .as("text"))
        val delta = dedup.Dedup.sigsOf(synth(-10000L, 0L)).localCheckpoint()
        Seq(rows / 10, rows).foreach { n =>
          val dir = java.nio.file.Files.createTempDirectory("probe-lsh").toString
          try {
            val t0 = System.nanoTime()
            dedup.Dedup.buildLshIndexFrom(synth(0L, n), dir, nFiles = 32)
            println(f"lsh build ($n docs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
            def probe(): Long = {
              val t = System.nanoTime()
              val c = dedup.Dedup.neardupDelta(spark, delta, dir).count()
              println(f"  probe (10k delta vs $n-doc index): " +
                f"${(System.nanoTime() - t) / 1e9}%.2f s ($c pairs)")
              c
            }
            probe(); probe() // warm + measured
            val t1 = System.nanoTime()
            dedup.Dedup.appendToLshIndex(spark, dir, delta)
            println(f"  append (10k batch into $n-doc index): " +
              f"${(System.nanoTime() - t1) / 1e9}%.2f s")
          } finally scala.util.Try(IndexLifecycle.deleteRecursively(dir))
        }
      case "statskip" =>
        // R20 items 1+3 at probe scale: the IS NULL audit and the
        // string-prefix band against a keyed table whose nullness /
        // tag prefix cluster with the layout (the ingest-ordered
        // shape). Claim: the pruned read's cost ∝ the matching band
        // across a 4× table jump, while the unpruned contrast scans
        // the table. Both variants must agree on counts.
        Seq(rows / 4, rows).foreach { n =>
          val dir = java.nio.file.Files.createTempDirectory("probe-statskip").toString
          try {
            val t = spark.range(n).select(col("id").as("k"),
              // v: null on the low tenth of the key space (a staged
              // backfill's untouched span); tag: prefix follows k
              when(col("id") < n / 10, lit(null).cast("long"))
                .otherwise(col("id") * 7).as("v"),
              concat(lit("T"), format_string("%04d", (col("id") * 100 / n).cast("int")),
                lit("-"), col("id")).as("tag"))
            operators.MergeTable.write(spark, t, "k", dir, nFiles = 64)
            // STRUCTURAL admission off the manifest (what the spec
            // pins the plan to at small scale): wall-clock on a warm
            // local[32] page cache is ~free either way — the claim
            // here is the file-count slope, which is what survives
            // on a 100 TB cold object store
            val man = operators.MergeTable.manifest(spark, dir).collect()
            val nullAdmit = man.count(r =>
              r.getAs[Long]("nn_v") < r.getAs[Long]("n_rows"))
            val pfxAdmit = man.count { r =>
              val (mn, mx) = (r.getAs[String]("min_tag"), r.getAs[String]("max_tag"))
              mx >= "T0042-" && mn <= "T0042-￿"
            }
            println(s"  admission ($n rows, ${man.length} files): " +
              s"IS NULL opens $nullAdmit, prefix band opens $pfxAdmit")
            def timed(label: String)(body: => Long): Long = {
              val t0 = System.nanoTime()
              val c = body
              println(f"  $label ($n rows): ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
              c
            }
            val a = timed("IS NULL pruned (readIndexed)") {
              operators.MergeTable.readIndexed(spark, dir)
                .filter(col("v").isNull).count()
            }
            val b = timed("IS NULL full-scan contrast") {
              operators.MergeTable.readTable(spark, dir)
                .filter(col("v").isNull).count()
            }
            require(a == b, s"null-skip counts diverged: $a vs $b")
            val c1 = timed("StartsWith pruned (readIndexed)") {
              operators.MergeTable.readIndexed(spark, dir)
                .filter(col("tag").startsWith("T0042-")).count()
            }
            val c2 = timed("StartsWith full-scan contrast") {
              operators.MergeTable.readTable(spark, dir)
                .filter(col("tag").startsWith("T0042-")).count()
            }
            require(c1 == c2, s"string-skip counts diverged: $c1 vs $c2")
          } finally scala.util.Try(IndexLifecycle.deleteRecursively(dir))
        }
      case "dd11bulk" =>
        // R20 item 7 (verdict): the REGISTERED dd11 row replays a
        // 20%-corpus delta against the posting store — a bulk
        // rebuild-shaped batch whose band join degrades to the
        // 2-exchange sort-merge (the ingest loop's human-scale batches
        // broadcast; this row deliberately measures the bulk shape).
        // Question: does letting the delta's band keys broadcast (a
        // higher threshold, or an explicit hint) recover the r18
        // level, or is the SMJ optimal for this shape? Counts must
        // agree across variants.
        val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
        val idx = java.nio.file.Files.createTempDirectory("probe-dd11bulk").toString
        try {
          dedup.Dedup.buildLshIndex(spark, sfDir, idx)
          val delta = dedup.Dedup.sigsOf(Tables.documents(spark, sfDir)
            .filter(col("doc_id") % dedup.Dedup.deltaMod >= dedup.Dedup.deltaFrom))
            .localCheckpoint()
          def rep(label: String)(body: => Long): Long = {
            var n = 0L
            (1 to 3).foreach { i =>
              val t0 = System.nanoTime()
              n = body
              println(f"  $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
            }
            n
          }
          // save the session's ACTUAL threshold: variants a and c must
          // run at the same (shipped) setting, whatever it is, and the
          // probe must not leave the session mutated
          val threshold0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
          val a = rep("shipped (default threshold)") {
            dedup.Dedup.neardupDelta(spark, delta, idx).count()
          }
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
          val b = rep("threshold 64m") {
            dedup.Dedup.neardupDelta(spark, delta, idx).count()
          }
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold0)
          // explicit hint: the inline dd11 join shape with the delta
          // side force-broadcast — the upper bound a planner change
          // could buy (NOT shippable unconditionally: a corpus-scale
          // delta force-broadcast OOMs the executors at 100 TB)
          val c = rep("explicit broadcast hint") {
            val cand = broadcast(dedup.Dedup.bandKeysOf(delta).toDF("delta_id", "bkey"))
              .join(graft.operators.MergeTable.readTable(spark, s"$idx/bands")
                .select(col("doc_id").as("base_id"), col("bkey")), Seq("bkey"))
              .select("delta_id", "base_id").distinct()
            val baseSigs = graft.operators.MergeTable.readTable(spark, s"$idx/sigs")
              .select(col("doc_id").as("base_id"), col("sig").as("base_sig"))
            cand.join(baseSigs, Seq("base_id"))
              .join(delta.toDF("delta_id", "delta_sig"), Seq("delta_id"))
              .select(col("delta_id"), col("base_id"),
                (round(dedup.Dedup.estJaccard(col("delta_sig"), col("base_sig")) * 10000) / 10000)
                  .as("est_jacc"))
              .filter(col("est_jacc") >= 0.5).count()
          }
          require(a == b && b == c, s"variant counts diverged: $a / $b / $c")
        } finally scala.util.Try(IndexLifecycle.deleteRecursively(idx))
      case "build" =>
        // R19 item 7: every stage of the corpus build is probed
        // individually (gate/dedup/decontaminate/cumsum/shards — see
        // the PLANS.md tables); this leg probes the ONE-COMMAND
        // composition, raw documents.parquet → committed shard dir,
        // at 1× and 10×. Synthetic docs are built to PASS tx16's
        // quality gate (20–90 tokens, stopwords present, unique-ish
        // tokens, sane word lengths) so the whole gating chain does
        // real work. shardSize scales with the corpus so the output
        // file count stays bounded (the CLI default of 128 docs/shard
        // is an sf0.01-scale setting, not a 10M-doc one).
        val docsExpr =
          """concat_ws(' ', transform(sequence(1, 60), j ->
            |  CASE WHEN j % 17 = 0 THEN 'the'
            |       WHEN j % 23 = 0 THEN 'and'
            |       ELSE concat('w', pmod(xxhash64(id * 97 + j), 999983)) END))"""
            .stripMargin
        Seq(rows / 10, rows).foreach { n =>
          val corpus = java.nio.file.Files
            .createTempDirectory("probe-build-corpus").toString
          val out = java.nio.file.Files
            .createTempDirectory("probe-build-out").toString + "/shards"
          try {
            spark.range(n)
              .select(col("id").as("doc_id"), expr(docsExpr).as("text"),
                lit("en").as("lang"),
                concat(lit("src"), pmod(col("id"), lit(4))).as("source"))
              .withColumn("n_chars", length(col("text")).cast("long"))
              .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
            val shardSize = math.max(128, n / 512).toInt
            val t0 = System.nanoTime()
            graft.cli.GraftCLI.build(spark, corpus, out, shardSize)
            println(f"cli build ($n docs, shardSize $shardSize): " +
              f"${(System.nanoTime() - t0) / 1e9}%.2f s")
          } finally Seq(corpus, java.nio.file.Path.of(out).getParent.toString)
            .foreach(d => scala.util.Try(IndexLifecycle.deleteRecursively(d)))
        }
      case "tripin" =>
        // what the `oriented` localCheckpoint is worth: unpinned, the
        // wedge self-join's e1/e2 subtrees each re-execute the two
        // degree joins (nothing guarantees ReusedExchange fires across
        // them under AQE); pinned, orientation runs once and the
        // self-join reads the checkpointed edges twice. Same ring+hub
        // graph as `tri`, same result set — the delta is pure
        // double-execution.
        // third arg: a testdata dir → probe pr02's REAL co-purchase
        // graph instead of the synthetic ring+hub (the bench row's
        // own edge distribution)
        val edges = args.lift(2) match {
          case Some(dir) => graph.PageRank.copurchaseEdges(spark, dir)
            .localCheckpoint()
          case None =>
            val nRing = rows
            val hub = 20000L
            val ring = spark.range(1L, nRing)
              .select(col("id").as("a"), (col("id") + 1).as("b"))
              .unionAll(spark.range(1L, nRing - 1)
                .select(col("id").as("a"), (col("id") + 2).as("b")))
            val celeb = spark.range(1L, hub + 1)
              .select(lit(0L).as("a"), col("id").as("b"))
            ring.unionAll(celeb).distinct().localCheckpoint()
        }
        def run3(label: String, pin: Boolean): Long = {
          // warm once, then report the best of 2 (probe discipline:
          // least-contended observation of the same plan)
          def once(): (Long, Double) = {
            val t0 = System.nanoTime()
            val c = graph.PageRank.triangleCountsImpl(edges, pinOriented = pin)
              .agg(sum("n_triangles")).head().getLong(0)
            (c, (System.nanoTime() - t0) / 1e9)
          }
          once()
          val obs = Seq(once(), once())
          val best = obs.map(_._2).min
          println(f"$label: best $best%.2f s (${obs.head._1 / 3} triangles)")
          obs.head._1
        }
        val graphLabel = args.lift(2)
          .map(d => s"co-purchase graph at $d")
          .getOrElse(s"$rows-ring + 20000-degree hub")
        val pinned = run3(s"pinned oriented ($graphLabel)", pin = true)
        val unpinned = run3("unpinned oriented (degree joins on both wedge sides)", pin = false)
        require(pinned == unpinned, s"pin variants disagree: $pinned vs $unpinned")
        // the structural question behind the timing: does the
        // unpinned plan actually double-execute, or does exchange
        // reuse already deduplicate the e1/e2 orientation subtrees?
        val probe = graph.PageRank.triangleCountsImpl(edges, pinOriented = false)
          .agg(sum("n_triangles"))
        probe.head()
        val plan = probe.queryExecution.executedPlan.toString
        val reused = "ReusedExchange".r.findAllIn(plan).length
        println(s"unpinned executed plan: $reused ReusedExchange node(s)")
      case "trideg" =>
        // what an eager pin of the node-sized `deg` aggregate is
        // worth: unpinned, the plan consumes deg FOUR times (da/db on
        // the e1 side + again inside e2's broadcast subtree), each a
        // 2m-row union + aggregation, and exchange reuse does not
        // fire across them; pinned, the union+agg runs once into a
        // node-sized checkpoint. Interleaved arms on pr02's real
        // co-purchase graph (pass the sf dir via SPARK_GRAFT_SF_DIR);
        // results asserted identical.
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val reps = args.lift(1).map(_.toInt).getOrElse(3)
        def onceDeg(pin: Boolean): (Double, Long) = {
          val t0 = System.nanoTime()
          val c = graph.PageRank.triangleCountsImpl(
              graph.PageRank.copurchaseEdges(spark, sfDir),
              pinOriented = false, pinDeg = pin)
            .agg(sum("n_triangles")).head().getLong(0)
          ((System.nanoTime() - t0) / 1e9, c)
        }
        onceDeg(pin = true); onceDeg(pin = false) // warm codegen
        val obsD = (1 to reps).flatMap(_ =>
          Seq(true, false).map(p => p -> onceDeg(p)))
        val sums = obsD.map(_._2._2).distinct
        require(sums.size == 1, s"pin arms disagree: $sums")
        Seq(true, false).foreach { p =>
          val ts = obsD.filter(_._1 == p).map(_._2._1)
          println(f"trideg pinDeg=$p: median ${ts.sorted.apply((ts.size - 1) / 2)}%.2f s (min ${ts.min}%.2f)")
        }
      case "pr" =>
        // pr01's cadence decision, measured: 10 damped iterations on
        // a uniform random graph, varying how often the rank lineage
        // is truncated. checkpointEvery=1 materializes every
        // iteration (10 blocking jobs); =3 is pr01's default (each
        // job computes 3 lazy iterations); =10 runs the whole chain
        // as ONE job with a 10-iteration-deep plan.
        val nNodes = rows / 10
        val prEdges = spark.range(rows).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
          pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("dst"))
        Seq(1, 3, 10).foreach { every =>
          val t0 = System.nanoTime()
          val total = graph.PageRank.pageRank(prEdges, iters = 10,
              checkpointEvery = every)
            .agg(sum("rank")).head().getDouble(0)
          println(f"pagerank 10 iters, checkpointEvery=$every ($rows edges): ${(System.nanoTime() - t0) / 1e9}%.2f s")
          require(math.abs(total - 1.0) < 1e-6, s"mass drifted: $total")
        }
      case "bitmap64" =>
        // q58's claim, measured: the sketch-table pattern on the
        // sparse bitmap. Keys live in a 64-bit domain the dense
        // bitmap cannot hold (it would need 2^61 bytes); they are
        // locally dense / globally sparse (contiguous ids at a high
        // 64-bit offset — the snowflake-id shape Roaring's containers
        // are designed for; each group's ~nd/3 keys per 65 536-value
        // chunk land WELL past the 4096 array cap, so this layout
        // exercises the promoted bitmap-container regime). The exact
        // path re-aggregates the FACTS for every rollup level
        // (per-group + grand total = two distinct aggregations, each
        // shuffling one row per distinct (g, k)); the sketch path
        // scans facts ONCE to build 12 group sketches, then every
        // further rollup level merges 12 sketch rows without touching
        // the facts — the asymmetry grows with every additional level
        // a reporting stack wants.
        val nd = math.max(rows / 4, 1L)
        def src = spark.range(rows).select(
          pmod(col("id"), lit(12)).as("g"),
          (lit(3L << 40) + pmod(col("id"), lit(nd))).as("k"))
        val exactGrp = src.groupBy("g").agg(countDistinct("k").as("d"))
        val exactAll = src.agg(countDistinct("k").as("d"))
        def sketches = src.groupBy("g")
          .agg(functions.GraftFunctions.bitmap64Agg("k").as("sk"))
        // warm pass (Janino/JIT) — Bench's discipline
        Seq(exactGrp, exactAll).foreach(
          _.write.format("noop").mode("overwrite").save())
        sketches.write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        val eg = exactGrp.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val ea = exactAll.head().getLong(0)
        println(f"exact countDistinct, per-group + grand total (two facts aggregations, $rows rows): ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val t1 = System.nanoTime()
        val sk = sketches.localCheckpoint()
        println(f"sparse sketch build (ONE facts aggregation): ${(System.nanoTime() - t1) / 1e9}%.2f s")
        val bytes = sk.select(sum(length(col("sk"))).as("b")).head().getLong(0)
        println(f"sketch table: ${bytes / 1e6}%.2f MB for ~$nd distinct keys (${bytes.toDouble / nd}%.2f B/key)")
        val t2 = System.nanoTime()
        val sg = sk.select(col("g"),
            functions.GraftFunctions.bitmap64Count("sk").as("d"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val sa = sk.agg(functions.GraftFunctions.bitmap64Union("sk").as("u"))
          .select(functions.GraftFunctions.bitmap64Count("u").as("d"))
          .head().getLong(0)
        println(f"both rollup levels from the 12-row sketch table (facts untouched): ${(System.nanoTime() - t2) / 1e9}%.2f s")
        require(sg == eg && sa == ea,
          s"sketch rollup diverged from exact: $sg/$sa vs $eg/$ea")
        // scenario B: CONTIGUOUS per-group key ranges (the sequence-id
        // shape) — the RUN containers collapse each chunk to ~8 bytes,
        // so the sketch table is no longer ∝ keys at all
        val span = (nd + 11) / 12
        def srcB = spark.range(rows).select(
          (pmod(col("id"), lit(nd)) / lit(span)).cast("long").as("g"),
          (lit(3L << 40) + pmod(col("id"), lit(nd))).as("k"))
        def sketchesB = srcB.groupBy("g")
          .agg(functions.GraftFunctions.bitmap64Agg("k").as("sk"))
        sketchesB.write.format("noop").mode("overwrite").save() // warm
        val t3 = System.nanoTime()
        val skB = sketchesB.localCheckpoint()
        println(f"contiguous-range sketch build: ${(System.nanoTime() - t3) / 1e9}%.2f s")
        val bytesB = skB.select(sum(length(col("sk"))).as("b")).head().getLong(0)
        println(f"contiguous-range sketch table: ${bytesB / 1e3}%.1f KB for ~$nd distinct keys (run containers)")
        val sgB = skB.select(col("g"),
            functions.GraftFunctions.bitmap64Count("sk").as("d"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val egB = srcB.groupBy("g").agg(countDistinct("k").as("d"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        require(sgB == egB, s"contiguous sketch diverged: $sgB vs $egB")
      case "annappend" =>
        // appendToIvfIndex's ingest claim, measured: a fixed-size
        // vector batch appended to a 1× and a 10× persisted IVF/PQ
        // index. The append is one narrow assign+encode pass over the
        // BATCH plus batch-sized partitioned file writes — resident
        // vectors are never read or rewritten — so its cost must stay
        // flat across index scale, while the alternative it replaces
        // (a full rebuild) grows ∝ corpus. Both are timed here from
        // the SHIPPED code paths.
        val vdim = 64
        val batchRows = 100000L
        def synth(n: Long, off: Long) = spark.range(n)
          .select((col("id") + off).as("vec_id"),
            expr(s"transform(sequence(1, $vdim), j -> " +
              "cast(pmod(xxhash64(id * 64 + j), 1000) as float) / 1000.0)")
              .as("embedding"),
            lit("c").as("label"))
        Seq(rows / 10, rows).foreach { n =>
          val corpus = java.nio.file.Files.createTempDirectory("probe-annapp").toString
          synth(n, 0L).write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
          val idx = s"$corpus/idx"
          val t0 = System.nanoTime()
          // sample ∝ 1/mod keeps training ~50k vectors at every scale:
          // the rebuild contrast should measure the corpus-sized
          // assignment+write, not an ever-growing training set
          similarity.Similarity.buildIvfIndex(spark, corpus, idx,
            nCells = 64, iters = 2, sampleMod = math.max(1, (n / 50000).toInt))
          println(f"full build ($n vecs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
          val batch = synth(batchRows, n + 1000000L).select("vec_id", "embedding")
          batch.write.format("noop").mode("overwrite").save() // warm (Janino/JIT)
          val t1 = System.nanoTime()
          similarity.Similarity.appendToIvfIndex(spark, idx, batch)
          println(f"append ($batchRows vecs onto $n-vec index): ${(System.nanoTime() - t1) / 1e9}%.2f s")
          val total = similarity.Similarity.indexVectors(spark, idx).count()
          require(total == n + batchRows, s"append lost rows: $total != ${n + batchRows}")
        }
      case "drift" =>
        // The add-without-train trade, measured: appendToIvfIndex
        // keeps centroids fixed, so a batch whose distribution has
        // DRIFTED from the build-time sample crowds into few cells.
        // This probe quantifies what that costs (recall@10, probe
        // wall, cell skew) on the appended index vs a full retrain
        // over the union — the numbers behind the scaladoc's "rebuild
        // when skew crosses the workload's floor".
        val vdim = 64
        val n = rows
        val batchN = n / 10
        val k = 10
        def uni(col0: String) = s"cast(pmod(xxhash64($col0 * 64 + j), 1000) as float) / 1000.0"
        // base: uniform directions; drifted: mass concentrated on the
        // first 8 dims — a direction cluster the build never saw
        def base(m: Long, off: Long) = spark.range(m)
          .select((col("id") + off).as("vec_id"),
            expr(s"transform(sequence(1, $vdim), j -> ${uni("id")})").as("embedding"),
            lit("c").as("label"))
        def drifted(m: Long, off: Long) = spark.range(m)
          .select((col("id") + off).as("vec_id"),
            expr(s"transform(sequence(1, $vdim), j -> case when j <= 8 then ${uni("id")} + 3.0f " +
              s"else ${uni("id")} * 0.02f end)").as("embedding"),
            lit("c").as("label"))
        val corpus = java.nio.file.Files.createTempDirectory("probe-drift").toString
        base(n, 0L).write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
        val idx = s"$corpus/idx"
        similarity.Similarity.buildIvfIndex(spark, corpus, idx,
          nCells = 64, iters = 3, sampleMod = math.max(1, (n / 50000).toInt))
        val batch = drifted(batchN, n + 1000000L).select("vec_id", "embedding")
        similarity.Similarity.appendToIvfIndex(spark, idx, batch)
        def skewOf(ix: String): (Long, Double) = {
          val cs = similarity.Similarity.ivfCellStats(spark, ix)
            .select("n").collect().map(_.getLong(0))
          (cs.max, cs.max.toDouble / (cs.sum.toDouble / cs.length))
        }
        val (mx1, sk1) = skewOf(idx)
        println(f"appended index cell skew: max=$mx1 (${sk1}%.1f x mean)")
        // 40 drifted queries, never inserted anywhere
        val queries = drifted(40, 900000000L)
          .select(col("vec_id").as("q_id"),
            col("embedding").cast("array<double>").as("va"))
          .withColumn("na", graft.functions.GraftFunctions.l2norm("va"))
        queries.cache().count()
        // exact ground truth over the union corpus
        val all = base(n, 0L).unionByName(drifted(batchN, n + 1000000L))
          .select(col("vec_id").as("n_id"),
            col("embedding").cast("array<double>").as("vb"))
          .withColumn("nb", graft.functions.GraftFunctions.l2norm("vb"))
        val cos = expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, x) -> a + x)") /
          (col("na") * col("nb"))
        val truth = queries.crossJoin(all)
          .select(col("q_id"), col("n_id"), cos.as("cos"))
          .groupBy("q_id")
          .agg(graft.functions.GraftFunctions.topK("cos", "n_id", k).as("tk"))
          .select(col("q_id"), explode(col("tk")).as("p"))
          .select(col("q_id"), col("p.id").as("n_id"))
          .collect().groupBy(_.getLong(0)).view
          .mapValues(_.map(_.getLong(1)).toSet).toMap
        def recallOf(ix: String): (Double, Double) = {
          val t0 = System.nanoTime()
          val got = similarity.Similarity.probeIvf(spark, ix, queries, nProbe = 8, k = k)
            .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
          val secs = (System.nanoTime() - t0) / 1e9
          val hit = got.count { case (q, nid) => truth.get(q).exists(_.contains(nid)) }
          (hit.toDouble / truth.values.map(_.size).sum, secs)
        }
        val (recA, secA) = recallOf(idx)
        println(f"appended index (trained pre-drift): recall@$k=$recA%.3f, probe $secA%.2f s")
        // the retrain contrast: rebuild over the union
        val corpus2 = java.nio.file.Files.createTempDirectory("probe-drift2").toString
        base(n, 0L).unionByName(drifted(batchN, n + 1000000L))
          .write.mode("overwrite").parquet(s"$corpus2/embeddings.parquet")
        val idx2 = s"$corpus2/idx"
        val t2 = System.nanoTime()
        similarity.Similarity.buildIvfIndex(spark, corpus2, idx2,
          nCells = 64, iters = 3, sampleMod = math.max(1, ((n + batchN) / 50000).toInt))
        println(f"retrain over union: ${(System.nanoTime() - t2) / 1e9}%.2f s")
        val (mx2, sk2) = skewOf(idx2)
        println(f"retrained index cell skew: max=$mx2 (${sk2}%.1f x mean)")
        val (recB, secB) = recallOf(idx2)
        println(f"retrained index: recall@$k=$recB%.3f, probe $secB%.2f s")
      case "zorder" =>
        // writeClustered's claim, measured: on a 2-D-filtered fact
        // table, a key-range layout is perfectly selective on the key
        // and USELESS on the second column (every file admitted); the
        // z-order layout prunes on BOTH. Timed: a y-band scanWhere on
        // each layout at bench-dwarfing scale.
        val dirZ = java.nio.file.Files.createTempDirectory("probe-z").toString
        val dirR = java.nio.file.Files.createTempDirectory("probe-r").toString
        val nF = 64
        val src = spark.range(rows).select(col("id").as("k"),
          pmod(xxhash64(col("id")), lit(100000)).as("x"),
          pmod(xxhash64(col("id") + 7), lit(100000)).as("y"),
          (pmod(xxhash64(col("id") + 13), lit(1000)) / 10.0).as("v"))
        val t0 = System.nanoTime()
        operators.MergeTable.writeClustered(spark, src, "k", Seq("x", "y"), dirZ, nF)
        println(f"z-order write ($rows rows, $nF files): ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val t1 = System.nanoTime()
        operators.MergeTable.write(spark, src, "k", dirR, nF)
        println(f"key-range write: ${(System.nanoTime() - t1) / 1e9}%.2f s")
        def admitted(d: String, c: String, lo: Long, hi: Long): Int =
          operators.MergeTable.manifest(spark, d)
            .filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi).count().toInt
        // a y band of ~1/16 of the domain
        val (lo, hi) = (40000L, 46250L)
        Seq(("z-order", dirZ), ("key-range", dirR)).foreach { case (label, d) =>
          val adm = admitted(d, "y", lo, hi)
          val t2 = System.nanoTime()
          val n = operators.MergeTable.scanWhere(spark, d, "y", lo, hi)
            .agg(count(lit(1)), sum("v")).head()
          println(f"$label y-band scan ($adm/$nF files admitted, ${n.getLong(0)} rows): " +
            f"${(System.nanoTime() - t2) / 1e9}%.2f s")
        }
        // the key stays prunable on the z layout too
        println(s"z-order x-band admits ${admitted(dirZ, "x", lo, hi)}/$nF files " +
          s"(key-range: ${admitted(dirR, "x", lo, hi)}/$nF)")
        // Catalyst-pushdown path: the SAME band as a plain .filter on
        // readIndexed — GraftFileIndex prunes at plan time — vs the
        // naive full read + filter
        Seq(("readIndexed + .filter (pushdown)",
              () => operators.MergeTable.readIndexed(spark, dirZ)),
            ("readTable + .filter (no index)",
              () => operators.MergeTable.readTable(spark, dirZ))).foreach {
          case (label, mk) =>
            val t3 = System.nanoTime()
            val n = mk().filter(col("y") >= lo && col("y") <= hi)
              .agg(count(lit(1)), sum("v")).head()
            println(f"$label y-band on z layout (${n.getLong(0)} rows): " +
              f"${(System.nanoTime() - t3) / 1e9}%.2f s")
        }
      case "merge" =>
        // q59's claim, measured: a banded change batch against a
        // 64-file keyed table — the manifest-pruned merge (rewrite
        // only intersecting files) vs the q56-style whole-snapshot
        // rewrite. Both compute the same answer; the difference is
        // the files read and rewritten, which is the entire game at
        // 100 TB (a day's batch against a year's dimension).
        val nFiles = 64
        val dir = java.nio.file.Files.createTempDirectory("probe-merge").toString
        val src = spark.range(rows).select(col("id").as("k"),
          concat(lit("seg"), pmod(col("id"), lit(7))).as("seg"),
          (pmod(xxhash64(col("id")), lit(100000)) / 100.0).as("bal"))
        val t0 = System.nanoTime()
        operators.MergeTable.write(spark, src, "k", dir, nFiles)
        println(f"table build ($rows rows, $nFiles files): ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // change batch confined to one file's key band (~1/64)
        val band = rows / nFiles
        val changes = spark.range(band).select(col("id").as("k"),
            when(col("id") % 3 === 0, lit("D")).otherwise(lit("U")).as("op"),
            lit("WEB").as("seg"), lit(1.0).as("bal"))
          .unionByName(spark.range(1000).select((col("id") + rows + 1000000L).as("k"),
            lit("I").as("op"), lit("NEW").as("seg"), lit(2.0).as("bal")))
        changes.write.format("noop").mode("overwrite").save() // warm
        val t1 = System.nanoTime()
        val stats = operators.MergeTable.merge(spark, dir, changes, "k")
        println(f"pruned merge (${stats.touched.size}/$nFiles files rewritten): ${(System.nanoTime() - t1) / 1e9}%.2f s")
        // the naive contrast: same overlay plan over the WHOLE table,
        // whole snapshot rewritten (q56's shape materialized)
        val naiveOut = java.nio.file.Files.createTempDirectory("probe-merge-naive").toString
        val all = operators.MergeTable.readTable(spark, dir)
        val t2 = System.nanoTime()
        all.join(changes.filter(col("op") === "U")
              .select(col("k"), col("seg").as("u_seg"), col("bal").as("u_bal")),
            Seq("k"), "left_outer")
          .join(changes.filter(col("op") === "D").select("k"), Seq("k"), "left_anti")
          .select(col("k"), coalesce(col("u_seg"), col("seg")).as("seg"),
            coalesce(col("u_bal"), col("bal")).as("bal"))
          .unionByName(changes.filter(col("op") === "I").select("k", "seg", "bal"))
          .repartitionByRange(nFiles, col("k"))
          .write.mode("overwrite").parquet(naiveOut)
        println(f"whole-snapshot rewrite (all $nFiles files): ${(System.nanoTime() - t2) / 1e9}%.2f s")
        // CDC read-side: the manifest-pruned file diff (opens only the
        // files that differ between gen 0 and 1) vs diffing two full
        // snapshots — the incremental consumer's cost at 100 TB.
        val t3 = System.nanoTime()
        val delta = operators.MergeTable.changesBetween(spark, dir, 0, 1, "k").count()
        println(f"pruned CDC read ($delta net changes): ${(System.nanoTime() - t3) / 1e9}%.2f s")
        val oldT = operators.MergeTable.readTable(spark, dir, asOf = Some(0))
          .select(col("k"), lit(true).as("io"), col("seg").as("os"), col("bal").as("ob"))
        val newT = operators.MergeTable.readTable(spark, dir)
          .select(col("k"), lit(true).as("in_"), col("seg").as("ns"), col("bal").as("nb"))
        val t4 = System.nanoTime()
        val naiveDelta = oldT.join(newT, Seq("k"), "full_outer")
          .filter(col("in_").isNull || col("io").isNull ||
            !(col("os") <=> col("ns")) || !(col("ob") <=> col("nb"))).count()
        println(f"full-snapshot diff ($naiveDelta net changes): ${(System.nanoTime() - t4) / 1e9}%.2f s")
        require(naiveDelta == delta, s"CDC diverged: pruned $delta vs full $naiveDelta")
      case "dd02split" =>
        // r22: where do dd02's seconds go — tokenize+shingle, the
        // df-capped index, the posting build, or pair gen + scoring?
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val reps = args.lift(1).map(_.toInt).getOrElse(3)
        def t(label: String)(mk: => DataFrame): Unit = {
          mk.write.format("noop").mode("overwrite").save() // warm
          val obs = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            mk.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"dd02split $label: median ${obs.sorted.apply((reps - 1) / 2)}%.2f s (min ${obs.min}%.2f)")
        }
        t("shingles")(dedup.Dedup.probeShingles(spark, sfDir))
        t("cappedIndex")(dedup.Dedup.probeCappedIndex(spark, sfDir))
        t("postings")(dedup.Dedup.probePostings(spark, sfDir))
        t("full pairs")(dedup.Dedup.probePairs(spark, sfDir))
      case "tripart" =>
        // r22 follow-up: is pr02's wedge-enumeration stage starved of
        // parallelism? The und checkpoint's partition count is set by
        // AQE from its INPUT bytes (~13 MB at sf0.1 → coalesced to ~1
        // partition), but the stage's OUTPUT is the O(m^1.5) wedge
        // set — generator-heavy stages need parallelism ∝ output.
        // Prints the checkpoint partition counts and every stage's
        // (tasks, wall) for one pr02 run.
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val stages = java.util.Collections.synchronizedList(
          new java.util.ArrayList[(Int, Int, Double)]())
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              stages.add((si.stageId, si.numTasks,
                (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3))
            }
          })
        val edges = graph.PageRank.copurchaseEdges(spark, sfDir)
        val und = edges.toDF("a", "b")
          .select(least(col("a"), col("b")).as("a"),
            greatest(col("a"), col("b")).as("b"))
          .filter(col("a") =!= col("b"))
          .distinct().localCheckpoint()
        println(s"und: ${und.count()} edges, ${und.rdd.getNumPartitions} partitions")
        graph.PageRank.triangleCounts(edges)
          .write.format("noop").mode("overwrite").save()
        Thread.sleep(500)
        stages.toArray(Array.empty[(Int, Int, Double)]).sortBy(-_._3).take(8)
          .foreach { case (id, n, s) =>
            println(f"stage $id%4d: $n%4d tasks, $s%7.2f s") }
      case "stageprof" =>
        // generic stage profile: run one registered query through the
        // noop sink and print the slowest stages' (tasks, wall) — the
        // AQE-starvation detector (a long stage with few tasks on a
        // 32-core box). Usage: stageprof 0 <query> (the main parses
        // args(1) as the numeric rows slot; the query rides args(2)).
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val qname = args.lift(2).getOrElse("dd08_embed_neardup_ivf")
        val stages = java.util.Collections.synchronizedList(
          new java.util.ArrayList[(Int, Int, Double)]())
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              stages.add((si.stageId, si.numTasks,
                (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3))
            }
          })
        SparkEntry.queries(qname)(spark, sfDir)
          .write.format("noop").mode("overwrite").save() // warm
        stages.clear()
        SparkEntry.queries(qname)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Thread.sleep(500)
        println(s"stage profile: $qname")
        stages.toArray(Array.empty[(Int, Int, Double)]).sortBy(-_._3).take(8)
          .foreach { case (id, n, s) =>
            println(f"stage $id%4d: $n%4d tasks, $s%7.2f s") }
      case "trifan" =>
        // r22 follow-up: A/B the wedge-stage fan-out (repartition the
        // e1 side to defaultParallelism on the broadcast path) against
        // the inherited checkpoint partitioning. Interleaved arms,
        // identical triangle totals asserted.
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val reps = args.lift(1).map(_.toInt).getOrElse(3)
        def onceFan(fan: Boolean): (Double, Long) = {
          val t0 = System.nanoTime()
          val c = graph.PageRank.triangleCountsImpl(
              graph.PageRank.copurchaseEdges(spark, sfDir),
              pinOriented = false, pinDeg = false, fanOut = fan)
            .agg(sum("n_triangles")).head().getLong(0)
          ((System.nanoTime() - t0) / 1e9, c)
        }
        onceFan(fan = true); onceFan(fan = false) // warm codegen
        val obsF = (1 to reps).flatMap(_ => Seq(true, false).map(f => f -> onceFan(f)))
        require(obsF.map(_._2._2).distinct.size == 1,
          s"fan arms disagree: ${obsF.map(_._2._2).distinct}")
        Seq(true, false).foreach { f =>
          val ts = obsF.filter(_._1 == f).map(_._2._1)
          println(f"trifan fanOut=$f: median ${ts.sorted.apply((ts.size - 1) / 2)}%.2f s (min ${ts.min}%.2f)")
        }
      case "dd09pair" =>
        // r22 follow-up: dd09's pair form A/B — the original single
        // interpreted flatten(transform) explode vs the shared
        // two-level index explode (allPairs, oversized branch
        // statically absent). Interleaved arms, identical results
        // asserted.
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val reps = args.lift(1).map(_.toInt).getOrElse(3)
        val width = 8
        val dfCap = 64
        def posts = {
          val wh = Tables.documents(spark, sfDir)
            .select(col("doc_id"), expr(text.TextAnalysis.toksExpr).as("t"))
            .filter(size(col("t")) >= width)
            .select(col("doc_id"), explode(array_distinct(
              functions.GraftFunctions.rollingHashes("t", width))).as("h"))
          wh.groupBy("h").agg(sort_array(collect_set("doc_id")).as("ds"))
            .filter(size(col("ds")).between(2, dfCap))
        }
        def finish(pairs: DataFrame): DataFrame = pairs
          .groupBy("id1", "id2").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2).orderBy("id1", "id2")
        def lambdaArm: DataFrame = finish(posts.select(explode(expr(
            """flatten(transform(ds, (x, i) ->
              |  transform(slice(ds, i + 2, size(ds)), y -> struct(x AS id1, y AS id2))))"""
              .stripMargin)).as("p"))
          .select(col("p.id1").as("id1"), col("p.id2").as("id2")))
        def newArm: DataFrame = finish(
          dedup.Dedup.allPairs(posts, chunk = dfCap, mayExceedChunk = false))
        val la = lambdaArm.collect().map(_.toSeq).toSeq
        val na = newArm.collect().map(_.toSeq).toSeq
        require(la == na, s"dd09 arms diverge: ${la.size} vs ${na.size}")
        println(s"dd09 arms identical (${la.size} rows)")
        def onceP(useNew: Boolean): Double = {
          val t0 = System.nanoTime()
          (if (useNew) newArm else lambdaArm)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        onceP(useNew = true); onceP(useNew = false) // warm
        val obsP = (1 to reps).flatMap(_ => Seq(true, false).map(u => u -> onceP(u)))
        Seq(true, false).foreach { u =>
          val ts = obsP.filter(_._1 == u).map(_._2)
          println(f"dd09 newForm=$u: median ${ts.sorted.apply((ts.size - 1) / 2)}%.2f s (min ${ts.min}%.2f)")
        }
      case "gencorpus" =>
        // r22 (VERDICT item 9): synthesize a LARGER corpus by key-
        // offset replication of sf0.1 (the driver's generator isn't
        // available and /root/testdata is read-only), so the top-10
        // heaviest rows can be scaling-sampled at 8 vs 32 cores on a
        // corpus ~10× the bench SF. Referential integrity is
        // preserved per copy (order/part/supplier/customer keys
        // offset consistently); document texts are vowel-rotated and
        // embeddings perturbed per copy so the near-dup operators
        // don't face a 100× cross-copy duplicate explosion that no
        // real sf1 corpus would have. Usage:
        //   gencorpus <outDir> [copies]   (source from SPARK_GRAFT_SF_DIR)
        val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val out = args.lift(1).getOrElse("/tmp/sf1synth")
        val copies = args.lift(2).map(_.toInt).getOrElse(10)
        val (kC, kS, kP, kO, kD, kV, kE) =
          (1000000L, 1000000L, 1000000L, 10000000L, 1000000L, 1000000L, 10000000L)
        def rep(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
          val base = spark.read.parquet(s"$src/$t.parquet")
          val all = (0 until copies).map(i => f(base, i)).reduce(_ unionByName _)
          all.write.mode("overwrite").parquet(s"$out/$t.parquet")
          println(s"gencorpus $t written x$copies")
        }
        Seq("region", "nation").foreach(t => spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet"))
        rep("customer")((df, i) => df.select(
          (col("c_custkey") + i * kC).as("c_custkey"),
          concat(col("c_name"), lit(s"#$i")).as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
        rep("supplier")((df, i) => df.select(
          (col("s_suppkey") + i * kS).as("s_suppkey"),
          concat(col("s_name"), lit(s"#$i")).as("s_name"),
          col("s_nationkey"), col("s_acctbal")))
        rep("part")((df, i) => df.select(
          (col("p_partkey") + i * kP).as("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice")))
        rep("orders")((df, i) => df.select(
          (col("o_orderkey") + i * kO).as("o_orderkey"),
          (col("o_custkey") + i * kC).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority")))
        rep("lineitem")((df, i) => df.select(
          (col("l_orderkey") + i * kO).as("l_orderkey"),
          (col("l_partkey") + i * kP).as("l_partkey"),
          (col("l_suppkey") + i * kS).as("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate")))
        rep("documents")((df, i) => df.select(
          (col("doc_id") + i * kD).as("doc_id"),
          translate(col("text"), "aeiou",
            "aeiou".drop(i % 5) + "aeiou".take(i % 5)).as("text"),
          col("lang"), col("source"), col("n_chars")))
        rep("embeddings")((df, i) => df.select(
          (col("vec_id") + i * kV).as("vec_id"),
          expr(s"transform(embedding, (x, k) -> " +
            s"cast(x + ((($i * 31 + k) % 7) - 3) * 0.001 as float))").as("embedding"),
          col("label")))
        rep("events")((df, i) => df.select(
          (col("event_id") + i * kE).as("event_id"), col("ts"),
          (col("user_id") + i * kC).as("user_id"),
          col("event_type"), col("value"), col("props")))
      case "dd02pack" =>
        // r22: pair-generation formulation probe for dd02 — (a) the
        // shipped slice+struct lambdas, (b) index-based generation
        // (element_at, no per-element slice copies), (c) index-based
        // with the pair packed into ONE long (ids < 2^32). Scores via
        // the same count-aggregate + sizes joins so the measured
        // deltas are end-to-end.
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val reps = args.lift(1).map(_.toInt).getOrElse(3)
        val chunk = 128
        def postings = dedup.Dedup.probePostings(spark, sfDir)
        def sizes = dedup.Dedup.probeShingles(spark, sfDir)
          .groupBy("doc_id").agg(count(lit(1)).as("n"))
        def score(pairs: DataFrame): DataFrame = pairs
          .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
          .join(sizes.toDF("d1", "n1"), col("id1") === col("d1"))
          .join(sizes.toDF("d2", "n2"), col("id2") === col("d2"))
          .select(col("id1"), col("id2"),
            (round((col("inter").cast("double") /
              (col("n1") + col("n2") - col("inter"))) * 10000) / 10000).as("jacc"))
          .filter(col("jacc") >= 0.2)
        // (b) index-based struct pairs (small postings only + big chunks)
        def idxStruct: DataFrame = {
          val small = postings
            .filter(size(col("ds")) <= chunk && size(col("ds")) >= 2)
            .select(explode(expr(
              """flatten(transform(sequence(0, size(ds) - 2), i ->
                |  transform(sequence(i + 1, size(ds) - 1), j ->
                |    struct(element_at(ds, i + 1) AS id1, element_at(ds, j + 1) AS id2))))"""
                .stripMargin)).as("p"))
            .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
          small
        }
        // (c) index-based packed-long pairs
        def idxPacked: DataFrame = {
          val small = postings
            .filter(size(col("ds")) <= chunk && size(col("ds")) >= 2)
            .select(explode(expr(
              """flatten(transform(sequence(0, size(ds) - 2), i ->
                |  transform(sequence(i + 1, size(ds) - 1), j ->
                |    element_at(ds, i + 1) * 4294967296L + element_at(ds, j + 1))))"""
                .stripMargin)).as("pk"))
            .select((col("pk") / 4294967296L).cast("long").as("id1"),
              pmod(col("pk"), lit(4294967296L)).as("id2"))
          small
        }
        // (a) shipped formulation, small postings only (apples to apples)
        def shipped: DataFrame = postings.filter(size(col("ds")) <= chunk)
          .select(explode(expr(
            """flatten(transform(ds, (x, i) ->
              |  transform(slice(ds, i + 2, size(ds)), y -> struct(x AS id1, y AS id2))))"""
              .stripMargin)).as("p"))
          .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
        def t(label: String)(mk: => DataFrame): Unit = {
          mk.write.format("noop").mode("overwrite").save() // warm
          val obs = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            mk.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"dd02pack $label: median ${obs.sorted.apply((reps - 1) / 2)}%.2f s (min ${obs.min}%.2f)")
        }
        // (d) two-level explode over index sequences — NO interpreted
        // lambdas anywhere and no per-posting pair-array
        // materialization: both Generates and the element_at
        // projection are whole-stage codegen
        def twoExplode: DataFrame = postings
          .filter(size(col("ds")) <= chunk && size(col("ds")) >= 2)
          .select(col("ds"), explode(expr("sequence(0, size(ds) - 2)")).as("i"))
          .select(col("ds"),
            expr("element_at(ds, i + 1)").as("id1"),
            explode(expr("sequence(i + 1, size(ds) - 1)")).as("j"))
          .select(col("id1"), expr("element_at(ds, j + 1)").as("id2"))
        t("shipped slice+struct")(score(shipped))
        t("idx struct")(score(idxStruct))
        t("idx packed-long")(score(idxPacked))
        t("two-level explode")(score(twoExplode))
        // content equality of the four pair sets
        val a = score(shipped).collect().map(_.toSeq).toSet
        val b = score(idxStruct).collect().map(_.toSeq).toSet
        val c = score(idxPacked).collect().map(_.toSeq).toSet
        val e4 = score(twoExplode).collect().map(_.toSeq).toSet
        require(a == b && b == c && c == e4,
          s"pair sets diverge: ${a.size}/${b.size}/${c.size}/${e4.size}")
        println(s"dd02pack verified: ${a.size} pairs identical across formulations")
      case "prcadence" =>
        // r22: pr01's lineage-truncation cadence × the node-broadcast
        // hint, A/B'd on the real fulfillment graph (pass the sf dir
        // as the `rows` arg slot via env SPARK_GRAFT_SF_DIR). Cadence
        // trades checkpoint materializations (low cadence) against
        // re-evaluating the unmaterialized tail per broadcast build
        // (high cadence).
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val reps = args.lift(1).map(_.toInt).getOrElse(3)
        def onceCad(cad: Int, bcast: Boolean): Double = {
          spark.conf.set("spark.graft.pagerank.broadcastMaxNodes",
            if (bcast) "2000000" else "0")
          val t0 = System.nanoTime()
          graph.PageRank.pageRank(
              graph.PageRank.fulfillmentEdges(spark, sfDir),
              checkpointEvery = cad)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        onceCad(3, bcast = true) // warm codegen
        for (bcast <- Seq(true, false); cad <- Seq(2, 3, 5)) {
          val obs = (1 to reps).map(_ => onceCad(cad, bcast))
          println(f"pr cadence=$cad bcast=$bcast: median ${obs.sorted.apply((reps - 1) / 2)}%.2f s (min ${obs.min}%.2f)")
        }
        spark.conf.set("spark.graft.pagerank.broadcastMaxNodes", "2000000")
      case "rangebarrier" =>
        // r22: the range-write double evaluation, A/B-measured. Every
        // repartitionByRange(n>1) evaluates its input twice (bounds
        // sample + shuffle); the lazy localCheckpoint barrier
        // (spark.graft.rangeWriteBarrier, default on) evaluates once
        // and re-reads blocks. Arms interleave on one session so both
        // see the same host state; medians over reps.
        val reps = args.lift(2).map(_.toInt).getOrElse(5)
        val nFiles = 16
        // PARQUET-backed source, not spark.range: the bench fixtures
        // and every production staged write read files — recomputing a
        // generated range is free, re-scanning parquet is not, and the
        // barrier's value is exactly the avoided second scan
        val srcDir = java.nio.file.Files.createTempDirectory("probe-rb-src").toString
        spark.range(rows).select(col("id").as("k"),
            concat(lit("seg"), pmod(col("id"), lit(7))).as("seg"),
            (pmod(xxhash64(col("id")), lit(100000)) / 100.0).as("bal"))
          .write.mode("overwrite").parquet(srcDir)
        val src = spark.read.parquet(srcDir)
        def once(on: Boolean): (Double, Double) = {
          spark.conf.set("spark.graft.rangeWriteBarrier", on.toString)
          val dir = java.nio.file.Files.createTempDirectory("probe-rb").toString
          val t0 = System.nanoTime()
          operators.MergeTable.write(spark, src, "k", dir, nFiles)
          val wSecs = (System.nanoTime() - t0) / 1e9
          val band = col("k") * 8 <= lit(rows - 1)
          val changes = src.filter(band && col("k") % 5 === 0 && col("k") % 7 =!= 0)
            .select(col("k"), lit("U").as("op"), lit("WEB").as("seg"),
              (col("bal") + 100).as("bal"))
            .unionByName(src.filter(band && col("k") % 7 === 0)
              .select(col("k"), lit("D").as("op"),
                lit(null).cast("string").as("seg"),
                lit(null).cast("double").as("bal")))
            .unionByName(src.filter(band && col("k") % 5 === 1)
              .select((col("k") + rows).as("k"), lit("I").as("op"),
                col("seg"), col("bal")))
          val t1 = System.nanoTime()
          operators.MergeTable.merge(spark, dir, changes, "k")
          val mSecs = (System.nanoTime() - t1) / 1e9
          graft.IndexLifecycle.deleteRecursively(dir)
          (wSecs, mSecs)
        }
        once(on = true); once(on = false) // warm both plans' codegen
        val obs = (1 to reps).flatMap(_ =>
          Seq(true, false).map(on => on -> once(on)))
        def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
        Seq(true, false).foreach { on =>
          val ws = obs.filter(_._1 == on).map(_._2._1)
          val ms = obs.filter(_._1 == on).map(_._2._2)
          println(f"barrier=$on ($rows rows, $nFiles files, $reps reps): " +
            f"write median ${med(ws)}%.2f s (min ${ws.min}%.2f), " +
            f"merge median ${med(ms)}%.2f s (min ${ms.min}%.2f)")
        }
        spark.conf.set("spark.graft.rangeWriteBarrier", "true")
      case "restoreclone" =>
        // q67/q68's 100 TB claim, measured: RESTORE and SHALLOW CLONE
        // are O(manifest) — a directory listing, a file-count-sized
        // existence sweep, one tiny parquet write — while the naive
        // alternative (re-materialize the wanted state) is O(table).
        // The gap IS the operator: at 100 TB the right-hand numbers
        // become hours, the left-hand ones stay where they are.
        val nFiles = 64
        val dir = java.nio.file.Files.createTempDirectory("probe-rc").toString
        val src = spark.range(rows).select(col("id").as("k"),
          concat(lit("seg"), pmod(col("id"), lit(7))).as("seg"),
          (pmod(xxhash64(col("id")), lit(100000)) / 100.0).as("bal"))
        val tB = System.nanoTime()
        operators.MergeTable.write(spark, src, "k", dir, nFiles)
        println(f"table build ($rows rows, $nFiles files): ${(System.nanoTime() - tB) / 1e9}%.2f s")
        val changes = spark.range(rows / nFiles).select(col("id").as("k"),
          lit("U").as("op"), lit("WEB").as("seg"), lit(1.0).as("bal"))
        val tM = System.nanoTime()
        operators.MergeTable.merge(spark, dir, changes, "k")
        println(f"banded merge (gen 1): ${(System.nanoTime() - tM) / 1e9}%.2f s")
        val tC = System.nanoTime()
        operators.MergeTable.cloneTable(spark, dir, s"$dir-clone")
        println(f"shallow clone of the 2-gen table: ${(System.nanoTime() - tC) / 1e9}%.2f s")
        val tR = System.nanoTime()
        operators.MergeTable.restore(spark, dir, 0)
        println(f"restore to gen 0 (incl. per-file existence sweep): ${(System.nanoTime() - tR) / 1e9}%.2f s")
        require(operators.MergeTable.readTable(spark, dir)
          .filter(col("seg") === "WEB").limit(1).isEmpty, "restore leaked merged rows")
        // the naive contrast for BOTH: deep-copy the wanted state
        val deep = java.nio.file.Files.createTempDirectory("probe-rc-deep").toString
        val tD = System.nanoTime()
        operators.MergeTable.write(spark,
          operators.MergeTable.readTable(spark, dir, asOf = Some(1)), "k", deep, nFiles)
        println(f"deep copy (the O(table) alternative): ${(System.nanoTime() - tD) / 1e9}%.2f s")
        Seq(dir, s"$dir-clone", deep).foreach(IndexLifecycle.deleteRecursively)
      case "build" =>
        // the capstone: pp11's COMPOSED plan (gate ∘ dedup ∘
        // decontaminate ∘ globalRank ∘ shard rollup) at bench scale
        // ×1 and ×10 — each stage has its own probe; the untested
        // surface is AQE's behavior under the join-heavy composition.
        // Replicas get shifted ids and a per-replica salt token so
        // the dedup stage keeps doing real (non-degenerate) work
        // instead of collapsing 10 replicas into one survivor.
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val baseDocs = Tables.documents(spark, sfDir)
        Seq(1, 10).foreach { reps =>
          val dir = java.nio.file.Files.createTempDirectory(s"probe-build-x$reps").toString
          (0 until reps).map(rIdx => baseDocs
              .withColumn("doc_id", col("doc_id") + lit(rIdx * 100000000L))
              .withColumn("text", concat(col("text"), lit(s" replicasalt$rIdx"))))
            .reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
          val nd = spark.read.parquet(s"$dir/documents.parquet").count()
          def stages = Seq[(String, () => DataFrame)](
            ("tx16 gate stage", () => graft.text.TextAnalysis.tx16_quality_gate(spark, dir)),
            ("pp05 decontaminate stage", () => pipeline.Pipeline.pp05_decontaminate(spark, dir)),
            ("pp11 full build", () => pipeline.Pipeline.pp11_full_build(spark, dir)))
          if (reps == 1) // warm pass at the small scale (Janino/JIT)
            stages.foreach(st => st._2().write.format("noop").mode("overwrite").save())
          stages.foreach { case (label, mk) => time(s"$label ($nd docs)")(mk()) }
        }
      case "tx17vocab" =>
        // tx17's one documented vocab-proportional intermediate (the
        // bigram prefix-total aggregate), measured: the SHIPPED tx17
        // over synthetic corpora whose bigram vocabulary differs 10×
        // at identical corpus size. If wall time tracks corpus (the
        // explode) rather than vocabulary, the intermediate needs no
        // tx14-style cap; the bigram-count subplan is timed alone as
        // the explode-only contrast.
        val docsN = math.max(rows / 100, 1000L) // default 200k docs
        val toksPerDoc = 100
        Seq(rows / 200, rows / 20).foreach { v =>
          val dir = java.nio.file.Files.createTempDirectory(s"probe-tx17-v$v").toString
          spark.range(docsN).select(col("id").as("doc_id"),
            expr(s"array_join(transform(sequence(1, $toksPerDoc), " +
              s"j -> concat('t', pmod(xxhash64(id * $toksPerDoc + j), $v))), ' ')")
              .as("text"))
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
          val tx17 = () => graft.text.TextAnalysis.tx17_bigram_lp(spark, dir)
          val explodeOnly = () => Tables.documents(spark, dir)
            .select(col("doc_id"), expr(
              "filter(split(lower(text), '\\\\W+'), x -> x != '')").as("t"))
            .select(col("doc_id"), explode(expr(
              "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("g"))
            .groupBy("g").agg(count(lit(1)).as("cnt"))
          tx17().write.format("noop").mode("overwrite").save() // warm
          val distinctBg = explodeOnly().count()
          time(s"bigram explode+count alone (~$v target vocab, $distinctBg distinct bigrams)")(explodeOnly())
          time(s"tx17 full ($docsN docs, ~$v target vocab)")(tx17())
        }
      case "dd13sig" =>
        // The bottom-k signature stage of dd13, old vs new plan, on a
        // synthetic exploded (source, shingle) stream with ~50×
        // duplication (what a re-crawled corpus looks like after the
        // per-doc explode). OLD: global distinct() then topK heap —
        // shuffles the whole shingle universe twice. NEW: set-heap
        // topKDistinct — one exchange carrying ≤k-slot buffers.
        import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
        val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
        val shuffleStages = new java.util.concurrent.atomic.AtomicLong
        val lis = new SparkListener {
          override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
            val m = sc.stageInfo.taskMetrics
            val w = if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten
            if (w > 0) { shuffleBytes.addAndGet(w); shuffleStages.incrementAndGet() }
          }
        }
        val stream = spark.range(rows).select(
          concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
          pmod(xxhash64(col("id") / 50), lit(10000000L)).as("sh"))
          .select(col("source"), (col("sh").cast("double") * -1).as("nsh"), col("sh"))
        def measure(label: String)(df: DataFrame): Unit = {
          shuffleBytes.set(0); shuffleStages.set(0)
          spark.sparkContext.addSparkListener(lis)
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000) // listener bus drain
          spark.sparkContext.removeSparkListener(lis)
          println(f"$label: $sec%.2f s, shuffle ${shuffleBytes.get / 1048576.0}%.1f MiB over ${shuffleStages.get} stages")
        }
        val k = dedup.Dedup.dd13OverlapK
        measure(s"old: distinct + topK ($rows rows)")(
          stream.distinct().groupBy("source")
            .agg(graft.functions.GraftFunctions.topK("nsh", "sh", k).as("sig")))
        measure(s"new: topKDistinct ($rows rows)")(
          stream.groupBy("source")
            .agg(graft.functions.GraftFunctions.topKDistinct("nsh", "sh", k).as("sig")))

      case "cdc" =>
        // End-to-end streaming CDC: a band-confined merge against a
        // `rows`-row table must reach a running changesStream
        // subscriber in time ∝ the DELTA (the files the merge
        // rewrote), not the table — the property that makes the feed
        // tailable on a 100 TB dimension. Contrast rows: the
        // snapshot-bootstrap batch (∝ table, paid once) vs the two
        // incremental batches (∝ delta each).
        val nFiles = 64
        val dir = java.nio.file.Files.createTempDirectory("probe-cdc").toString
        val src = spark.range(rows).select(col("id").as("k"),
          concat(lit("seg"), pmod(col("id"), lit(7))).as("seg"),
          (pmod(xxhash64(col("id")), lit(100000)) / 100.0).as("bal"))
        operators.MergeTable.write(spark, src, "k", dir, nFiles)
        val delivered = new java.util.concurrent.atomic.AtomicLong
        val ckpt = java.nio.file.Files.createTempDirectory("probe-cdc-ckpt").toString
        val t0 = System.nanoTime()
        val q = operators.MergeTable.changesStream(spark, dir, "k", startGen = -1)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (delta: DataFrame, _: Long) =>
            delivered.addAndGet(delta.count()); ()
          }.start()
        q.processAllAvailable()
        println(f"snapshot bootstrap (${delivered.get} rows, $nFiles files): ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val band = rows / nFiles // one file's key span
        (1 to 2).foreach { g =>
          val changes = spark.range(band).select(col("id").as("k"),
            lit("U").as("op"), lit(s"GEN$g").as("seg"), lit(g.toDouble).as("bal"))
          operators.MergeTable.merge(spark, dir, changes, "k")
          delivered.set(0)
          val t1 = System.nanoTime()
          q.processAllAvailable()
          println(f"delta gen $g (${delivered.get} rows, ~1/$nFiles of table): ${(System.nanoTime() - t1) / 1e9}%.2f s")
        }
        q.stop()

      case "knnjoin" =>
        // ann09's scale claim, measured: with BOUNDED cell occupancy
        // (nCells ∝ corpus — the faiss sizing rule), the blocked k-NN
        // self-join's candidate volume grows LINEARLY in corpus size
        // (n × nProbe × occupancy), not n² — so wall should track
        // candidates across a 4× corpus jump (the probe discipline:
        // claim the SLOPE, not an absolute win). The brute contrast
        // is claimed by candidate COUNT (n² at 1M vectors is 1e12
        // cosines — untimeable is the point), not timed. Candidate
        // volume is EXACT: Σ_cell routed(cell) × |cell| from the
        // shipped routing pass + the index's own cell stats.
        val vdim = 64
        val nProbe = 3
        val occupancy = 500
        def synthV(n: Long) = spark.range(n)
          .select(col("id").as("vec_id"),
            expr(s"transform(sequence(1, $vdim), j -> " +
              "cast(pmod(xxhash64(id * 64 + j), 1000) as float) / 1000.0)")
              .as("embedding"),
            lit("c").as("label"))
        Seq(rows / 4, rows).foreach { n =>
          val corpus = java.nio.file.Files.createTempDirectory("probe-knn").toString
          try {
            synthV(n).write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
            val idx = s"$corpus/idx"
            val nCells = math.max(8, (n / occupancy).toInt)
            similarity.Similarity.buildIvfIndex(spark, corpus, idx,
              nCells = nCells, iters = 2,
              sampleMod = math.max(1, (n / 50000).toInt))
            val corpusVecs = spark.read.parquet(s"$corpus/embeddings.parquet")
              .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
              .withColumn("nrm", graft.functions.GraftFunctions.l2norm("v"))
            val routedPerCell = similarity.Similarity
              .routedCells(spark, idx, corpusVecs, nProbe)
              .groupBy("cell").count()
            val cand = routedPerCell
              .join(similarity.Similarity.ivfCellStats(spark, idx), Seq("cell"))
              .agg(sum(col("count") * col("n"))).collect()(0).getLong(0)
            println(f"$n vecs, $nCells cells: candidates=$cand%,d " +
              f"(${cand.toDouble / n}%.0f per row; brute n^2 would be ${n.toDouble * n}%.2e)")
            val t0 = System.nanoTime()
            similarity.Similarity.knnJoinIvf(spark, idx, corpusVecs,
                k = 5, nProbe = nProbe)
              .write.format("noop").mode("overwrite").save()
            println(f"knn join ($n vecs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
          } finally IndexLifecycle.deleteRecursively(corpus)
        }

      case "ivfvacuum" =>
        // Takedown vacuum on the vector index must cost ∝ the CELLS
        // holding tombstoned ids, not the index: tombstone a batch
        // confined to few cells of a `rows`-vector index and compare
        // the affected-cells rewrite against rewriting every cell.
        val corpus = java.nio.file.Files.createTempDirectory("probe-ivfv").toString
        val nCells = 64
        val src = spark.range(rows).select(col("id").as("vec_id"),
          array((0 until 128).map(i =>
            sin(col("id") * (i + 1) * 0.37).cast("float")): _*).as("embedding"),
          lit(0).as("label"))
        src.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
        val ix = java.nio.file.Files.createTempDirectory("probe-ivfv-ix").toString
        val tb = System.nanoTime()
        similarity.Similarity.buildIvfIndex(spark, corpus, ix, nCells = nCells)
        println(f"index build ($rows vectors, $nCells cells): ${(System.nanoTime() - tb) / 1e9}%.2f s")
        // tombstones = the full contents of ~2 cells (a takedown of
        // one crawl slice that clustered together)
        val vecs = similarity.Similarity.indexVectors(spark, ix)
        val twoCells = vecs.select("cell").distinct().limit(2)
          .collect().map(_.getInt(0)).toSeq
        val doomed = vecs.filter(col("cell").isin(twoCells: _*))
          .select("vec_id")
        similarity.Similarity.tombstoneVectors(spark, ix, doomed)
        val t0 = System.nanoTime()
        val n = similarity.Similarity.vacuumVectorTombstones(spark, ix)
        println(f"affected-cells vacuum ($n ids in ${twoCells.size}/$nCells cells): ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // contrast: a full-index rewrite (what a naive DELETE does)
        val out = java.nio.file.Files.createTempDirectory("probe-ivfv-rw").toString
        val t1 = System.nanoTime()
        similarity.Similarity.indexVectors(spark, ix)
          .repartition(nCells, col("cell"))
          .write.partitionBy("cell").mode("overwrite").parquet(out)
        println(f"full-index rewrite contrast (all $nCells cells): ${(System.nanoTime() - t1) / 1e9}%.2f s")

      case "ivfcompact" =>
        // Batched cell compaction: `rows` append batches fragment the
        // partitioned layout; the fold must cost ~a constant number
        // of Spark jobs (one listing + one write), NOT one job per
        // fragmented cell — the difference between a maintenance pass
        // and a 100k-job scheduler storm on a production index.
        import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
        val batches = math.max(2, math.min(rows, 64)).toInt
        val corpus = java.nio.file.Files.createTempDirectory("probe-ivfc").toString
        val n = 20000
        val src = spark.range(n).select(col("id").as("vec_id"),
          array((0 until 16).map(i =>
            sin(col("id") * (i + 1) * 0.37).cast("float")): _*).as("embedding"),
          lit(0).as("label"))
        src.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
        val ix = java.nio.file.Files.createTempDirectory("probe-ivfc-ix").toString
        similarity.Similarity.buildIvfIndex(spark, corpus, ix, nCells = 32)
        (1 to batches).foreach { b =>
          val batch = spark.range(n + b * 1000L, n + b * 1000L + 1000L)
            .select(col("id").as("vec_id"),
              array((0 until 16).map(i =>
                sin(col("id") * (i + 1) * 0.37).cast("float")): _*).as("embedding"))
          similarity.Similarity.appendToIvfIndex(spark, ix, batch)
        }
        val jobs = new java.util.concurrent.atomic.AtomicLong
        val jl = new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
        }
        spark.sparkContext.addSparkListener(jl)
        val t0 = System.nanoTime()
        val folds = similarity.Similarity.compactIvfCells(spark, ix)
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000)
        spark.sparkContext.removeSparkListener(jl)
        val before = folds.map(_.filesBefore).sum
        val after = folds.map(_.filesAfter).sum
        println(f"compact after $batches appends: ${folds.size} cells folded, $before -> $after files, $sec%.2f s, ${jobs.get} Spark jobs")
        // constant composition, not per-cell: a parallel file-listing
        // job (Spark lists >32 input paths with a job by design), an
        // optional schema-footer job, and ONE fold write — vs the
        // per-fragmented-cell scheduler storm this probe exists to
        // rule out
        require(jobs.get <= 6,
          s"batched fold should cost O(1) jobs, saw ${jobs.get}")

      case "ivm" =>
        // Incremental view maintenance, the SCALING SHAPE: a fixed
        // 1M-key change batch against tables 8× apart in size. The
        // refresh folds only the CDC delta + the 7-group view, so its
        // time must stay ~flat across the sizes; the recompute scans
        // the base, so its time must grow with the table. (At local
        // 100M scale the recompute's 2-column scan is cheap enough to
        // win on ABSOLUTE time — the probe's claim is the slope, which
        // is what decides at 10^12 rows, where a per-refresh base scan
        // is hours and the delta fold stays exactly this flat.)
        val nFiles = 64
        val deltaKeys = 1000000L
        val timings = Seq(rows / 8, rows).map { m =>
          val dir = java.nio.file.Files.createTempDirectory(s"probe-ivm-$m").toString
          val mv = java.nio.file.Files.createTempDirectory(s"probe-ivm-mv-$m").toString
          val src = spark.range(m).select(col("id").as("k"),
            concat(lit("seg"), pmod(col("id"), lit(7))).as("seg"),
            (pmod(xxhash64(col("id")), lit(100000)) / 100.0).as("bal"))
          operators.MergeTable.write(spark, src, "k", dir, nFiles)
          // decimal cents: the exact-arithmetic regime IncrementalView
          // enforces (a raw double sum is rejected)
          val spec = operators.IncrementalView.ViewSpec(Seq("seg"),
            Seq("sb" -> "cast(round(bal * 100) as decimal(38,0))"))
          operators.IncrementalView.materialize(spark, dir, "k", mv, spec)
          val changes = spark.range(deltaKeys).select(col("id").as("k"),
              when(col("id") % 3 === 0, lit("D")).otherwise(lit("U")).as("op"),
              lit("seg9").as("seg"), lit(1.0).as("bal"))
            .unionByName(spark.range(1000).select((col("id") + m + 7L).as("k"),
              lit("I").as("op"), lit("segA").as("seg"), lit(2.0).as("bal")))
          operators.MergeTable.merge(spark, dir, changes, "k")
          val t1 = System.nanoTime()
          operators.IncrementalView.refresh(spark, dir, mv, spec)
          val refreshS = (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          val truth = operators.IncrementalView.compute(
            operators.MergeTable.readTable(spark, dir), spec).collect()
          val recomputeS = (System.nanoTime() - t2) / 1e9
          println(f"$m%12d rows: refresh $refreshS%.2f s (delta $deltaKeys keys), recompute $recomputeS%.2f s")
          val got = operators.MergeTable.readTable(spark, mv)
            .drop(operators.IncrementalView.keyColName).collect()
          val gm = got.map(r =>
            r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
          truth.foreach { r =>
            val (n, sb) = gm(r.getString(0))
            require(n == r.getLong(1) && sb.compareTo(r.getDecimal(2)) == 0,
              s"view drifted on ${r.getString(0)}: ($n,$sb) vs $r")
          }
          (refreshS, recomputeS)
        }
        val (rSmall, cSmall) = timings.head
        val (rLarge, cLarge) = timings.last
        println(f"8x table growth: refresh ${rLarge / rSmall}%.2fx, recompute ${cLarge / cSmall}%.2fx")
        // the slope claims only hold where the scan dominates fixed
        // job overheads — below ~400M total the small side's recompute
        // is all overhead and the contrast is meaningless, so report
        // without enforcing (measured: 1.7x at 100M, 2.4-2.7x at 400M)
        if (rows >= 400000000L) {
          require(rLarge < rSmall * 3,
            f"refresh must stay ~flat under 8x table growth, grew ${rLarge / rSmall}%.1fx")
          require(cLarge > cSmall * 2,
            f"recompute contrast did not scale with the table (${cLarge / cSmall}%.1fx) — probe regime invalid")
        } else println(s"(regime checks skipped: run with >= 400000000 rows to enforce the slopes)")

      case "bloomidx" =>
        // Per-file bloom sidecar: a needle lookup on a column the
        // layout knows nothing about must open ~1 of 64 files after
        // one index-build pass; the contrast row filters the full
        // table. At 100 TB the full filter schedules every file's
        // scan task; the sidecar path stays file-count-flat.
        val nFiles = 64
        val dir = java.nio.file.Files.createTempDirectory("probe-bloomidx").toString
        val src = spark.range(rows).select(col("id").as("k"),
          concat(lit("tag-"), pmod(xxhash64(col("id")), lit(1000000007L))).as("tag"),
          (pmod(xxhash64(col("id") + 7L), lit(100000)) / 100.0).as("bal"))
        operators.MergeTable.write(spark, src, "k", dir, nFiles)
        val t0 = System.nanoTime()
        // ~780k keys/file at 50M/64 wants ≥10 bits/key: 2^23 bits =
        // 1 MB/sketch, fp < 1% per file (2^22 measured ~10% fp → 6.6
        // candidate files; sketch sizing is the pruning dial)
        operators.MergeTable.buildBloomIndex(spark, dir, "tag", numBits = 1 << 23)
        println(f"index build ($rows rows, $nFiles sketches): ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val probes = (1 to 5).map(i => rows / 7 * i)
        // probe tags must be REAL values: read them back from the table
        val tags = operators.MergeTable.readTable(spark, dir)
          .filter(col("k").isin(probes: _*)).select("tag").collect()
          .map(_.getString(0)).toSeq
        var cand = 0
        val t1 = System.nanoTime()
        tags.foreach { tag =>
          val (c, _, _) = operators.MergeTable.bloomCandidatePaths(spark, dir, "tag", tag)
          cand += c.size
          val n = operators.MergeTable.scanEqualsBloom(spark, dir, "tag", tag).count()
          require(n >= 1, s"bloom lookup lost the needle $tag")
        }
        println(f"${tags.size} bloom lookups (avg ${cand.toDouble / tags.size}%.1f/$nFiles files opened): ${(System.nanoTime() - t1) / 1e9}%.2f s")
        val t2 = System.nanoTime()
        tags.foreach { tag =>
          val n = operators.MergeTable.readTable(spark, dir)
            .filter(col("tag") === tag).count()
          require(n >= 1)
        }
        println(f"${tags.size} full-scan lookups (all $nFiles files): ${(System.nanoTime() - t2) / 1e9}%.2f s")
        // the lookup-service shape: one sidecar pass amortized over
        // the whole needle batch vs one full-table IN scan
        val t3 = System.nanoTime()
        val (bcands, _, _) = operators.MergeTable.bloomCandidatePathsIn(spark, dir, "tag", tags)
        val bn = operators.MergeTable.scanEqualsBloomIn(spark, dir, "tag", tags).count()
        println(f"batched bloom lookup (${tags.size} needles, ${bcands.size}/$nFiles files): ${(System.nanoTime() - t3) / 1e9}%.2f s, $bn rows")
        val t4 = System.nanoTime()
        val fn = operators.MergeTable.readTable(spark, dir)
          .filter(col("tag").isin(tags: _*)).count()
        println(f"batched full scan (${tags.size} needles, all $nFiles files): ${(System.nanoTime() - t4) / 1e9}%.2f s, $fn rows")
        require(bn == fn, s"batched bloom lookup diverged: $bn vs $fn")

      case "bloommaint" =>
        // Bloom-sidecar MAINTENANCE at merge commits: the per-merge
        // overhead must be delta-sized (sketch the new files + fold a
        // file-count-sized sidecar), candidate counts must stay ~1/64
        // across a steady merge diet with NO rebuild, and the avoided
        // alternative (a full rebuild per maintenance window) must
        // cost table-sized time in contrast. Two identical tables —
        // one indexed, one not — isolate the maintenance overhead as
        // the merge-time difference on the same batch.
        val nFiles = 64
        val dirA = java.nio.file.Files.createTempDirectory("probe-bm-idx").toString
        val dirB = java.nio.file.Files.createTempDirectory("probe-bm-plain").toString
        val src = spark.range(rows).select(col("id").as("k"),
          concat(lit("tag-"), pmod(xxhash64(col("id")), lit(1000000007L))).as("tag"),
          (pmod(xxhash64(col("id") + 7L), lit(100000)) / 100.0).as("bal"))
        operators.MergeTable.write(spark, src, "k", dirA, nFiles)
        operators.MergeTable.write(spark, src, "k", dirB, nFiles)
        val t0 = System.nanoTime()
        operators.MergeTable.buildBloomIndex(spark, dirA, "tag", numBits = 1 << 23)
        val buildS = (System.nanoTime() - t0) / 1e9
        println(f"index build ($rows rows, $nFiles sketches): $buildS%.2f s")
        (1 to 4).foreach { r =>
          val lo = r.toLong * (rows / 16)
          val batch = spark.range(lo, lo + 5000).select(col("id").as("k"),
              lit("U").as("op"), concat(lit(s"tag-m$r-"), col("id")).as("tag"),
              lit(0.5).as("bal"))
            .unionByName(spark.range(rows + r * 1000L, rows + r * 1000L + 1000)
              .select(col("id").as("k"), lit("I").as("op"),
                concat(lit(s"tag-i$r-"), col("id")).as("tag"), lit(1.5).as("bal")))
            .localCheckpoint() // both merges pay an identical, settled input
          val tA0 = System.nanoTime()
          operators.MergeTable.merge(spark, dirA, batch, "k")
          val tA = (System.nanoTime() - tA0) / 1e9
          val tB0 = System.nanoTime()
          operators.MergeTable.merge(spark, dirB, batch, "k")
          val tB = (System.nanoTime() - tB0) / 1e9
          // needles that exist ONLY in this round's new files: without
          // the fold those files are uncovered and admitted everywhere
          val needles = Seq(s"tag-m$r-${lo + 17}", s"tag-i$r-${rows + r * 1000L + 3}")
          var cand = 0
          needles.foreach { tag =>
            val (c, _, tot) = operators.MergeTable.bloomCandidatePaths(spark, dirA, "tag", tag)
            cand += c.size
            require(tot >= nFiles, s"lost files: $tot")
            require(operators.MergeTable.scanEqualsBloom(spark, dirA, "tag", tag).count() == 1,
              s"maintained lookup lost needle $tag")
          }
          println(f"round $r: merge+maintain $tA%.2f s vs plain merge $tB%.2f s " +
            f"(maintenance ≈ ${tA - tB}%.2f s), fresh-needle candidates " +
            f"${cand.toDouble / needles.size}%.1f/$nFiles")
          require(cand <= needles.size * 3,
            s"maintained sidecar decayed: $cand candidates over ${needles.size} probes")
        }
        // the avoided alternative for contrast: a full rebuild
        val t9 = System.nanoTime()
        operators.MergeTable.buildBloomIndex(spark, dirA, "tag", numBits = 1 << 23)
        println(f"full rebuild (the avoided per-window cost): ${(System.nanoTime() - t9) / 1e9}%.2f s")

      case "partialz" =>
        // Partial vs full recluster, the SCALING SHAPE under CONSTANT
        // FILE SIZE (the real 100 TB regime: file size is pinned at
        // ~hundreds of MB and file COUNT grows with the table, so the
        // small table gets 64 files and the 4×-larger one 256). A
        // fixed 1M-key band merge degrades one tile-ROW of the d=2 z
        // layout — Θ(√nFiles) files, the inherent z-order geometry of
        // a single-dimension band — so the partial fold must grow as
        // √size (2× across the 4× jump) while the full rewrite pays
        // the table (4×). Admission on the secondary dimension must
        // be restored by both.
        val deltaKeys = 1000000L
        val timings = Seq((rows / 4, 64), (rows, 256)).map { case (m, nFiles) =>
          val dir = java.nio.file.Files.createTempDirectory(s"probe-pz-$m").toString
          val src = spark.range(m).select(col("id").as("k"),
            pmod(col("id"), lit(4096)).as("x"),
            (col("id") / 4096).as("y"),
            (pmod(xxhash64(col("id")), lit(100000)) / 100.0).as("bal"))
          operators.MergeTable.writeClustered(spark, src, "k", Seq("x", "y"), dir, nFiles)
          def admitted(c: String, lo: Long, hi: Long): Int =
            operators.MergeTable.manifest(spark, dir).collect().count { r =>
              val mn = r.getAs[Long](s"min_$c"); val mx = r.getAs[Long](s"max_$c")
              !(mx < lo || mn > hi)
            }
          val fresh = admitted("x", 100, 140)
          val changes = spark.range(deltaKeys).select(col("id").as("k"),
            lit("U").as("op"), pmod(col("id"), lit(4096)).as("x"),
            (col("id") / 4096).as("y"), lit(0.5).as("bal"))
          operators.MergeTable.merge(spark, dir, changes, "k")
          val degradedAdmit = admitted("x", 100, 140)
          val t1 = System.nanoTime()
          val st = operators.MergeTable.reclusterPartial(spark, dir, "k", Seq("x", "y"))
          val partialS = (System.nanoTime() - t1) / 1e9
          val restored = admitted("x", 100, 140)
          require(st.untouched.nonEmpty && st.touched.nonEmpty,
            s"fixture degenerate: $st")
          require(restored <= fresh + 2,
            s"partial did not restore admission: fresh $fresh, degraded $degradedAdmit, restored $restored")
          val t2 = System.nanoTime()
          operators.MergeTable.recluster(spark, dir, "k", Seq("x", "y"), nFiles)
          val fullS = (System.nanoTime() - t2) / 1e9
          println(f"$m%12d rows: partial $partialS%.2f s (${st.touched.size} files folded, " +
            f"${st.untouched.size} carried; x-admission $fresh -> $degradedAdmit -> $restored), " +
            f"full $fullS%.2f s")
          (partialS, fullS)
        }
        val (pSmall, fSmall) = timings.head
        val (pLarge, fLarge) = timings.last
        println(f"4x table growth (constant file size): partial ${pLarge / pSmall}%.2fx " +
          f"(degradation-bound, ~sqrt), full ${fLarge / fSmall}%.2fx (table-bound)")
        require(pLarge / pSmall < fLarge / fSmall,
          "partial recluster should scale with the degradation, full with the table")

      case "ckpt" =>
        // Commit-log METADATA resolution must be FLAT in generation
        // count under checkpoint rollups: committedGen + committedMeta
        // + reflectedGen at 10^4 commits ~ their cost at 10^2 (pointer
        // + tail ≤ interval), where the un-checkpointed paths (listing
        // for committedGen, full backward walk for the view watermark)
        // pay O(commits). history stays O(N) by design — full lineage
        // — and the table's ROWS must be identical at every size.
        // Probe honesty: the claim is the SCALING RATIO between the
        // two sizes, not absolute wall wins (tiny metadata files are
        // page-cache-warm here).
        val commits = if (args.length > 1) rows.toInt else 10000
        val small = math.max(commits / 100, 32)
        val store = java.nio.file.Files.createTempDirectory("probe-ck-src").toString
        val mv = java.nio.file.Files.createTempDirectory("probe-ck").toString + "/v"
        operators.MergeTable.write(spark,
          spark.range(1000).select(col("id").as("k"),
            pmod(col("id"), lit(4)).cast("string").as("seg"),
            (col("id") * 15 / 10.0).as("bal")),
          "k", store, nFiles = 4)
        operators.IncrementalView.materialize(spark, store, "k", mv,
          operators.IncrementalView.ViewSpec(Seq("seg"),
            Seq("cents" -> "cast(round(bal * 100) as decimal(38,0))")))
        def resolveMs(reps: Int): Double = {
          val t0 = System.nanoTime()
          (1 to reps).foreach { _ =>
            require(operators.MergeTable.committedGen(mv).nonEmpty)
            require(operators.MergeTable.committedMeta(mv).contains("token"))
            require(operators.IncrementalView.reflectedGen(mv) == 0)
          }
          (System.nanoTime() - t0) / 1e6 / reps
        }
        def walkMs(reps: Int): Double = { // the un-checkpointed contrast
          val ptr = java.nio.file.Path.of(mv, "_log", "_last_checkpoint")
          val saved = java.nio.file.Files.readAllBytes(ptr)
          java.nio.file.Files.delete(ptr)
          try resolveMs(reps)
          finally { java.nio.file.Files.write(ptr, saved); () }
        }
        def mintTo(target: Int): Double = {
          val cur = operators.MergeTable.committedGen(mv).get
          val t0 = System.nanoTime()
          (cur + 1 to target).foreach(_ =>
            operators.MergeTable.commitCarryForward(mv, Map("op" -> "carry")))
          (System.nanoTime() - t0) / 1e9
        }
        // aux state so the root listings below return something real:
        // a bloom sidecar + a CDC horizon slot (registered in settle);
        // droppedColumns exercises the governance read path (empty set)
        operators.MergeTable.buildBloomIndex(spark, mv, "seg", numBits = 1 << 12)
        // aux resolutions all list the table ROOT — with commit markers
        // under _log/ the root holds only vacuum-bounded manifest/data
        // dirs plus the aux files themselves, so these stay flat at any
        // commit depth (pre-_log, 10^4 markers would ride every listing)
        def auxMs(reps: Int): Double = {
          val t0 = System.nanoTime()
          (1 to reps).foreach { _ =>
            require(operators.MergeTable.bloomIndexedColumns(mv).nonEmpty)
            require(operators.MergeTable.cdcHorizons(mv).nonEmpty)
            operators.MergeTable.droppedColumns(mv)
          }
          (System.nanoTime() - t0) / 1e6 / reps
        }
        def settle(gen: Int): Double = { // register-current + vacuum
          operators.MergeTable.registerCdcHorizon(mv, "probe-consumer", gen)
          val t0 = System.nanoTime()
          operators.MergeTable.vacuum(spark, mv)
          (System.nanoTime() - t0) / 1e9
        }
        val rowsAt0 = operators.MergeTable.readTable(spark, mv).count()
        val mintS1 = mintTo(small)
        resolveMs(50) // warm
        val msSmall = resolveMs(200)
        val walkSmall = walkMs(50)
        val vacS1 = settle(small)
        auxMs(20) // warm
        val auxSmall = auxMs(100)
        val mintS2 = mintTo(commits)
        val msBig = resolveMs(200)
        val walkBig = walkMs(10)
        val vacS2 = settle(commits)
        val auxBig = auxMs(100)
        println(f"mint: $small commits in $mintS1%.1f s, ${commits - small} more in $mintS2%.1f s " +
          f"(${(commits - small) / mintS2}%.0f commits/s, checkpointed path inside each mint)")
        println(f"resolution (committedGen+committedMeta+reflectedGen): " +
          f"$msSmall%.3f ms @ $small commits -> $msBig%.3f ms @ $commits commits " +
          f"(${msBig / msSmall}%.2fx across ${commits / small}x)")
        println(f"un-checkpointed contrast (listing + full walk): " +
          f"$walkSmall%.2f ms @ $small -> $walkBig%.2f ms @ $commits " +
          f"(${walkBig / walkSmall}%.2fx)")
        println(f"aux root listings (bloom cols + horizons + dropped cols), " +
          f"vacuum-settled: $auxSmall%.3f ms @ $small -> $auxBig%.3f ms @ $commits " +
          f"(${auxBig / auxSmall}%.2fx; settling vacuums $vacS1%.1f / $vacS2%.1f s)")
        // correctness at depth: rows identical, lineage complete
        require(operators.MergeTable.readTable(spark, mv).count() == rowsAt0,
          "carry commits changed the table")
        require(operators.MergeTable.history(spark, mv).count() == commits + 1,
          "lineage lost commits")
        require(operators.MergeTable.committedGen(mv).contains(commits))
        // the flat claim: ≤4x drift across a 100x commit-count jump
        // (IO jitter slack), while the walk path grows ~linearly
        require(msBig / msSmall < 4.0,
          f"checkpointed resolution not flat: $msSmall%.3f -> $msBig%.3f ms")
        require(walkBig / walkSmall > (commits / small) / 4.0,
          f"contrast suspicious: the walk path should scale with commits " +
            f"($walkSmall%.2f -> $walkBig%.2f ms)")
        // entry-count-flat, with one local-fs caveat the 10^5 run
        // surfaced: an ext4 directory FILE never shrinks, so a root
        // that peaked at 10^5 manifest dirs before the settling
        // vacuum keeps bloated htree blocks and readdir pays ~1.5 ms
        // forever (object stores / HDFS list server-side and don't).
        // The claim is therefore ratio-flat OR absolutely cheap —
        // either way 3 orders under the un-checkpointed walk.
        require(auxBig / auxSmall < 4.0 || auxBig < 5.0,
          f"aux listings not flat under _log layout: $auxSmall%.3f -> $auxBig%.3f ms")

      case "dv" =>
        // Deletion vectors vs the keyed-merge delete on the SCATTERED
        // shape (one key per file region — GDPR's "these ids,
        // everywhere"): the merge path must touch ~every file (cost ∝
        // TABLE), the vector path scans only the candidates' key
        // column and writes ∝ deleted rows. Constant file size across
        // a 4× table growth (partialz's regime): the vector delete's
        // cost must grow like the key-column scan, the merge delete's
        // like the full table rewrite. Reads stay exact either way;
        // the vector's read tax is one anti-join against a
        // deleted-rows-sized relation (measured for honesty).
        val timings = Seq((rows / 4, 64), (rows, 256)).map { case (m, nFiles) =>
          val dirA = java.nio.file.Files.createTempDirectory(s"probe-dv-$m").toString
          val dirB = java.nio.file.Files.createTempDirectory(s"probe-dvm-$m").toString
          val src = spark.range(m).select(col("id").as("k"),
            pmod(xxhash64(col("id")), lit(1000)).as("seg"),
            (pmod(xxhash64(col("id") + 7L), lit(100000)) / 100.0).as("bal"))
          operators.MergeTable.write(spark, src, "k", dirA, nFiles)
          operators.MergeTable.write(spark, src, "k", dirB, nFiles)
          val step = m / 2048 // 2048 scattered victims: ~8 per file
          val keys = spark.range(2048).select((col("id") * step).as("k"))
            .localCheckpoint()
          val t0 = System.nanoTime()
          val st = operators.MergeTable.deleteKeys(spark, dirA, "k", keys)
          val dvS = (System.nanoTime() - t0) / 1e9
          require(st.touched.size > nFiles / 2,
            s"fixture degenerate: only ${st.touched.size} files hit")
          val t1 = System.nanoTime()
          operators.MergeTable.merge(spark, dirB,
            keys.select(col("k"), lit("D").as("op"),
              lit(null).cast("long").as("seg"),
              lit(null).cast("double").as("bal")), "k")
          val mergeS = (System.nanoTime() - t1) / 1e9
          // identical visible rows either way
          val (ca, cb) = (operators.MergeTable.readTable(spark, dirA).count(),
            operators.MergeTable.readTable(spark, dirB).count())
          require(ca == cb && ca == m - keys.count(),
            s"dv and merge deletes disagree: $ca vs $cb")
          def readMs(dir: String): Double = {
            val t = System.nanoTime()
            operators.MergeTable.readTable(spark, dir)
              .agg(sum(col("k"))).collect()
            (System.nanoTime() - t) / 1e6
          }
          readMs(dirA); readMs(dirB) // warm
          val (rA, rB) = (readMs(dirA), readMs(dirB))
          println(f"$m%12d rows: dv delete $dvS%.2f s (${st.touched.size} files " +
            f"vectored, 0 rewritten) vs merge delete $mergeS%.2f s; " +
            f"read with vector ${rA}%.0f ms vs materialized ${rB}%.0f ms")
          (dvS, mergeS)
        }
        val (dSmall, mSmall) = timings.head
        val (dLarge, mLarge) = timings.last
        println(f"4x table growth: dv delete ${dLarge / dSmall}%.2fx vs " +
          f"merge delete ${mLarge / mSmall}%.2fx")
        // scaling-shape claim, like partialz/ckpt (local absolute wall
        // wins are probe-dishonest; the absolute numbers print above)
        require(dLarge / dSmall < mLarge / mSmall,
          "vector delete should scale with the deleted rows, the merge " +
            "delete with the table")
        // mixed-case read tax: the fixtures above vector EVERY file
        // (worst case). A vector confined to ~1/8 of the key space
        // dirties ~1/8 of the files, and readVisible's split scans the
        // clean 7/8 raw — the anti-join tax applies only to the dirty
        // slice, which is the realistic partially-vectored regime.
        val dirC = java.nio.file.Files.createTempDirectory("probe-dv-mix").toString
        val srcC = spark.range(rows).select(col("id").as("k"),
          pmod(xxhash64(col("id")), lit(1000)).as("seg"),
          (pmod(xxhash64(col("id") + 7L), lit(100000)) / 100.0).as("bal"))
        operators.MergeTable.write(spark, srcC, "k", dirC, 256)
        val stride = math.max(1L, rows / 8 / 2048)
        val concentrated = spark.range(2048)
          .select((col("id") * stride).as("k")).localCheckpoint()
        val stC = operators.MergeTable.deleteKeys(spark, dirC, "k", concentrated)
        require(stC.touched.size >= 8 && stC.touched.size <= 64,
          s"mixed-case fixture degenerate: ${stC.touched.size}/256 files vectored")
        def readMsC(): Double = {
          val t = System.nanoTime()
          operators.MergeTable.readTable(spark, dirC).agg(sum(col("k"))).collect()
          (System.nanoTime() - t) / 1e6
        }
        readMsC() // warm
        val rMix = readMsC()
        println(f"mixed case: ${stC.touched.size}/256 files vectored, " +
          f"read $rMix%.0f ms (clean files scan raw through the split)")

      case "dvdiet" =>
        // The LONG delete diet — the shape r11's cumulative vector
        // paid O(total hidden rows) per commit on (every dvdelete
        // rewrote old ∪ hits): with segments, a regular commit writes
        // ONLY its batch, so per-commit cost must stay FLAT as hidden
        // rows accumulate, and the one cap-rollup commit is the only
        // O(total) write (amortized O(total/cap)). Claims are
        // scaling-shape + structural (segment row counts ∝ batch),
        // per the probe-honesty discipline.
        val cap = operators.MergeTable.dvSegmentCap
        val dirD = java.nio.file.Files.createTempDirectory("probe-dvdiet").toString
        val srcD = spark.range(rows).select(col("id").as("k"),
          pmod(xxhash64(col("id")), lit(1000)).as("seg"),
          (pmod(xxhash64(col("id") + 7L), lit(100000)) / 100.0).as("bal"))
        operators.MergeTable.write(spark, srcD, "k", dirD, 64)
        val batch = 1024
        val diet = 2 * cap + 2 // crosses one rollup, ends mid-second-cycle
        val stride = math.max(1L, rows / (batch.toLong * diet) - 1)
        val times = (1 to diet).map { i =>
          // batch i deletes its own disjoint stripe of the key space
          val keys = spark.range(batch.toLong)
            .select((col("id") * diet * stride + i).as("k")).localCheckpoint()
          val t0 = System.nanoTime()
          operators.MergeTable.deleteKeys(spark, dirD, "k", keys)
          val sec = (System.nanoTime() - t0) / 1e9
          val segs = operators.MergeTable.dvSegments(dirD,
            operators.MergeTable.committedGen(dirD).get)
          val newestRows = spark.read.parquet(s"$dirD/${segs.last}").count()
          println(f"diet commit $i%2d: $sec%.2f s, ${segs.size} segment(s), " +
            f"newest holds $newestRows rows (hidden so far ~${i * batch})")
          (sec, segs.size, newestRows)
        }
        // rollup commits are the ones that COLLAPSED the list back to 1
        val rollups = times.zipWithIndex.drop(1)
          .filter { case ((_, s, _), idx) => s == 1 && times(idx - 1)._2 > 1 }
        val regular = times.zipWithIndex.drop(1)
          .filterNot { case ((_, s, _), idx) => s == 1 && times(idx - 1)._2 > 1 }
        require(rollups.nonEmpty, "diet never crossed the segment cap")
        // structural: every regular commit's newest segment is exactly
        // its batch (≤ batch — stats-admitted misses shrink it, never
        // grow it); the r11 design would show i*batch here
        regular.foreach { case ((_, _, nr), idx) =>
          require(nr <= batch,
            s"commit ${idx + 1} wrote $nr rows — more than its batch")
        }
        // scaling: the LAST regular commit (max hidden rows behind it)
        // vs the FIRST — flat within IO-jitter slack
        val early = regular.take(3).map(_._1._1).min
        val late = regular.takeRight(3).map(_._1._1).min
        println(f"regular commits: early $early%.2f s vs late $late%.2f s " +
          f"(${late / early}%.2fx across a ${diet}x hidden-row growth); " +
          f"rollup(s): ${rollups.map(t => f"${t._1._1}%.2f").mkString(", ")} s")
        // ADVISORY by default, not a gate: a 3-sample minimum of
        // second-scale commits is a wall-clock claim a contended
        // machine can fail spuriously. The STRUCTURAL requires above
        // (newest segment batch-sized, cap-8 rollup collapse) are the
        // flatness proof; the ratio is printed so a reader can spot
        // real drift. SPARK_GRAFT_PROBE_STRICT=1 restores the hard
        // gate for quiet/CI machines — the one place a wall-clock
        // regression the structural gates can't see (e.g. O(hidden-
        // rows) work per commit that leaves segment sizes intact)
        // should fail instead of WARN.
        if (late / early >= 3.0) {
          val msg = f"dvdiet timing ratio ${late / early}%.2fx >= 3.0 " +
            "across the diet — structural gates passed; on a quiet " +
            "machine this is a real commit-cost regression"
          if (sys.env.get("SPARK_GRAFT_PROBE_STRICT").contains("1"))
            sys.error(msg)
          else println(s"WARN $msg (likely contention; rerun quiet or " +
            "set SPARK_GRAFT_PROBE_STRICT=1)")
        }
        // reads stay exact through the whole diet
        require(operators.MergeTable.readTable(spark, dirD).count() ==
          spark.read.parquet(s"$dirD/files-g0~" +
            operators.MergeTable.metaAt(dirD, 0)("token")).count() -
            operators.MergeTable.dvInfo(dirD,
              operators.MergeTable.committedGen(dirD).get).get._2,
          "diet reads drifted from dv_rows accounting")

      case "calib" =>
        // the bench's host-calibration yardstick, standalone: three
        // noop-forced runs so a reader can sanity-check what a quiet
        // machine records before dividing a round's rows by it
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          Bench.calibWorkload(spark)
            .write.format("noop").mode("overwrite").save()
          println(f"calib rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }

      case "ixman" =>
        // The r18 index-manifest claims, measured at two fragment
        // scales (probe-honesty: claim the SLOPE, not absolute wins —
        // local warm-page scans are ~free): (a) head resolve stays
        // ms-scale as live files grow 10x (one small-file read; bytes
        // ∝ files); (b) a one-cell probe read touches EXACTLY that
        // cell's live files — fileCount/64 of the corpus — verified
        // by input_file_name, so probe IO is bounded by the manifest,
        // not the layout's fragmentation.
        val nCells = 64
        def mk(batches: Int): String = {
          val corpus = java.nio.file.Files.createTempDirectory("probe-ixm").toString
          val src = spark.range(20000).select(col("id").as("vec_id"))
            .withColumn("embedding", expr("transform(sequence(1, 16), j -> " +
              "cast(pmod(xxhash64(vec_id * 16 + j), 1000) as float) / 1000.0)"))
            .withColumn("label", lit("c"))
          src.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
          val ix = s"$corpus/idx"
          similarity.Similarity.buildIvfIndex(spark, corpus, ix, nCells = nCells)
          (1 to batches).foreach { b =>
            similarity.Similarity.appendToIvfIndex(spark, ix,
              spark.range(100000L * b, 100000L * b + 2000)
                .select(col("id").as("vec_id"))
                .withColumn("embedding", expr("transform(sequence(1, 16), j -> " +
                  "cast(pmod(xxhash64(vec_id * 16 + j), 1000) as float) / 1000.0)")))
          }
          ix
        }
        Seq(8, 80).foreach { batches =>
          val ix = mk(batches)
          val live = operators.IndexManifest.head(ix).get.files
          val t0 = System.nanoTime()
          (1 to 100).foreach(_ => operators.IndexManifest.head(ix))
          val resolveMs = (System.nanoTime() - t0) / 1e6 / 100
          val cell = similarity.Similarity.cellOfPath(live.head)
          val t1 = System.nanoTime()
          val touched = similarity.Similarity.indexVectors(spark, ix, Some(Seq(cell)))
            .select(org.apache.spark.sql.functions.input_file_name())
            .distinct().count()
          val oneCellSec = (System.nanoTime() - t1) / 1e9
          val expect = live.count(f => similarity.Similarity.cellOfPath(f) == cell)
          println(f"$batches appends: ${live.size} live files, head resolve $resolveMs%.2f ms, " +
            f"1-cell read touched $touched of ${live.size} files in $oneCellSec%.2f s")
          require(touched == expect.toLong,
            s"manifest pruning read $touched files, expected $expect")
          require(resolveMs < 50,
            f"head resolve should stay ms-scale, saw $resolveMs%.1f ms")
        }

      case "mm04hot" =>
        // mm04's hot-band claim, measured: a near-constant image
        // corpus (all-black frames, every sig identical) collapses
        // into ONE band bucket whose pair volume is quadratic in the
        // bucket — inherent to the pair-output contract, so the
        // question is DISTRIBUTION, not avoidance. Contrast the
        // SHIPPED band equi-join (hammingPairs — AQE skew-splits its
        // hot key at runtime; also timed with AQE off) against the
        // explicit chunk-spread alternative (hammingPairsChunked, the
        // AQE-off remedy). Run at 2M rows: uniform 64-bit sigs keep
        // background buckets tiny, so the hot bucket dominates and
        // the contrast isolates it.
        val hot = math.min(
          args.lift(2).map(_.toLong).getOrElse(8192L), rows).toInt
        val sigs = spark.range(rows).select(col("id").as("doc_id"),
          when(col("id") < hot, lit(-1L)) // the all-black aHash: all ones
            .otherwise(xxhash64(col("id"))).as("sig"))
        val expected = hot.toLong * (hot - 1) / 2
        def timed(label: String)(df: => DataFrame): Long = {
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"$label ($rows rows, $hot-doc hot band): " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
          n
        }
        // the SHIPPED plan itself, not a copy that could drift from it
        val spread = timed("chunk-spread postings")(
          multimodal.Multimodal.hammingPairsChunked(sigs, 10))
        val joinOn = timed("shipped band join, AQE skew-split on")(
          multimodal.Multimodal.hammingPairs(sigs, 10))
        // restore the PRE-probe value, not a hardcoded true — same
        // save/restore pattern as the ckpt probe above
        val aqePrev = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", false)
        val joinOff = timed("shipped band join, AQE off")(
          multimodal.Multimodal.hammingPairs(sigs, 10))
        spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
        require(spread == joinOn && joinOn == joinOff && spread >= expected,
          s"hot-band pair sets disagree: $spread / $joinOn / $joinOff, expected>=$expected")

      case other =>
        System.err.println(s"unknown probe '$other'; use calib | topn | cumsum | incr | hh | bloom | skew | tri | pr | bitmap64 | annappend | build | tx17vocab | merge | drift | dd13sig | ivfcompact | ivm | bloomidx | bloommaint | partialz | ckpt | dv | dvdiet | mm04hot | ixman")
        sys.exit(2)
    }
    spark.stop()
  }
}
