package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Per-file Bloom sidecar: pruning power on a layout-uncorrelated
  * column, zero false negatives, soundness when the index is stale
  * (post-build commits), and rebuild supersession.
  */
class BloomIndexSpec extends SparkSpecBase {
  import spark.implicits._

  /** tag is a keyed hash rendered as text — high-cardinality and
    * UNcorrelated with the key-range layout, so min/max stats (which
    * aren't kept for non-key strings anyway) could never prune it.
    */
  private def table(n: Int) =
    (1 to n).map { k =>
      (k.toLong, f"tag-${(k * 2654435761L) % 1000003}%07d", k * 1.5)
    }.toDF("k", "tag", "bal")

  private def tagOf(k: Long) = f"tag-${(k * 2654435761L) % 1000003}%07d"

  test("bloom lookup prunes most files and never false-negatives") {
    val dir = tmpDir("bloomidx")
    MergeTable.write(spark, table(2000), "k", dir, nFiles = 16)
    assert(MergeTable.buildBloomIndex(spark, dir, "tag") == 0)

    val probes = (1 to 2000 by 83).map(k => (k.toLong, tagOf(k.toLong)))
    var candTotal = 0
    probes.foreach { case (k, tag) =>
      val (cands, pruned, total) = MergeTable.bloomCandidatePaths(spark, dir, "tag", tag)
      assert(total == 16)
      assert(cands.size + pruned == total)
      candTotal += cands.size
      val got = MergeTable.scanEqualsBloom(spark, dir, "tag", tag)
        .select("k", "tag", "bal").as[(Long, String, Double)].collect().toSeq
      assert(got == Seq((k, tag, k * 1.5)), s"probe $tag: got $got")
    }
    // 2^17 bits / ~125 keys per file → fp ≈ 0; expect ~1 candidate per
    // probe. Anything ≤ 2 on average proves the sidecar is doing the
    // pruning (a no-op index would sit at 16).
    assert(candTotal <= probes.size * 2,
      s"weak pruning: $candTotal candidates over ${probes.size} probes")

    // absent needle: exact empty result
    assert(MergeTable.scanEqualsBloom(spark, dir, "tag", "tag-nope").count() == 0)
  }

  test("probe literal coerces to the column type — no Int-vs-Long false negatives") {
    val dir = tmpDir("bloomtyped")
    MergeTable.write(spark, table(400), "k", dir, nFiles = 8)
    MergeTable.buildBloomIndex(spark, dir, "k", numBits = 1 << 14)
    // k is LongType; probe with a plain Int — XxHash64 hashes the two
    // types differently, so an uncast literal would rule out every file
    val got = MergeTable.scanEqualsBloom(spark, dir, "k", 42)
      .select("k").as[Long].collect().toSeq
    assert(got == Seq(42L), s"typed-probe false negative: $got")
    val (cands, pruned, total) = MergeTable.bloomCandidatePaths(spark, dir, "k", 42)
    assert(total == 8 && pruned >= 6 && cands.nonEmpty, s"$cands/$total")
  }

  test("stale sidecar stays sound: post-build commits are admitted, results exact") {
    val dir = tmpDir("bloomstale")
    MergeTable.write(spark, table(400), "k", dir, nFiles = 8)
    MergeTable.buildBloomIndex(spark, dir, "tag")
    // rewrite one band AFTER the index: k=50 gets a brand-new tag that
    // no sketch has seen; its file is uncovered by the sidecar
    MergeTable.merge(spark, dir,
      Seq((50L, "U", "fresh-tag", 0.5)).toDF("k", "op", "tag", "bal"), "k")

    val (cands, _, total) = MergeTable.bloomCandidatePaths(spark, dir, "tag", "fresh-tag")
    assert(cands.nonEmpty, "uncovered rewritten file must be admitted")
    assert(total == 8)
    assert(MergeTable.scanEqualsBloom(spark, dir, "tag", "fresh-tag")
      .select("k").as[Long].collect().toSeq == Seq(50L))
    // the OLD tag of k=50 no longer exists; bloom admits its old file's
    // replacement or not — either way the residual filter keeps it exact
    assert(MergeTable.scanEqualsBloom(spark, dir, "tag", tagOf(50L)).count() == 0)
    // a key untouched by the merge still resolves through the stale index
    assert(MergeTable.scanEqualsBloom(spark, dir, "tag", tagOf(333L))
      .select("k").as[Long].collect().toSeq == Seq(333L))
  }

  test("property: lookups never false-negative across a random merge/rebuild lifecycle") {
    val rnd = new scala.util.Random(7)
    val dir = tmpDir("bloomprop")
    var live = (1 to 300).map(k => k.toLong -> s"tag-${rnd.nextInt(1000000)}-$k").toMap
    var gone = Set.empty[String]
    MergeTable.write(spark,
      live.toSeq.map { case (k, t) => (k, t, k * 1.0) }.toDF("k", "tag", "bal"),
      "k", dir, nFiles = 6)
    MergeTable.buildBloomIndex(spark, dir, "tag", numBits = 1 << 14)
    var nextKey = 1000L
    (1 to 4).foreach { round =>
      val dels = rnd.shuffle(live.keys.toSeq).take(rnd.nextInt(10))
      val upds = rnd.shuffle((live.keySet -- dels).toSeq).take(rnd.nextInt(10))
        .map(k => k -> s"tag-r$round-$k")
      val inss = (0 until rnd.nextInt(8)).map { _ =>
        nextKey += 1; nextKey -> s"tag-new$round-$nextKey"
      }
      val batch =
        dels.map(k => (k, "D", null: String, 0.0)) ++
          upds.map { case (k, t) => (k, "U", t, 0.5) } ++
          inss.map { case (k, t) => (k, "I", t, 1.5) }
      MergeTable.merge(spark, dir, batch.toDF("k", "op", "tag", "bal"), "k")
      gone = gone ++ dels.map(live) ++ upds.flatMap { case (k, _) => live.get(k) }
      live = (live -- dels) ++ upds ++ inss
      if (round == 2) MergeTable.buildBloomIndex(spark, dir, "tag", numBits = 1 << 14)
      // every probed CURRENT tag must resolve to exactly its row —
      // covered or not by the (possibly stale) sidecar
      rnd.shuffle(live.toSeq).take(12).foreach { case (k, t) =>
        val got = MergeTable.scanEqualsBloom(spark, dir, "tag", t)
          .select("k").as[Long].collect().toSeq
        assert(got == Seq(k), s"round $round: tag $t gave $got, want $k")
      }
      // and tags that left the table resolve to nothing
      rnd.shuffle(gone.toSeq).take(4).foreach { t =>
        assert(MergeTable.scanEqualsBloom(spark, dir, "tag", t).count() == 0,
          s"round $round: departed tag $t still resolves")
      }
    }
  }

  test("rebuild supersedes the old sidecar and restores full pruning") {
    val dir = tmpDir("bloomrebuild")
    MergeTable.write(spark, table(400), "k", dir, nFiles = 8)
    MergeTable.buildBloomIndex(spark, dir, "tag")
    MergeTable.merge(spark, dir,
      Seq((50L, "U", "fresh-tag", 0.5)).toDF("k", "op", "tag", "bal"), "k")
    assert(MergeTable.buildBloomIndex(spark, dir, "tag") == 1)

    // exactly one sidecar dir remains, named for generation 1
    val names = {
      val ls = java.nio.file.Files.list(java.nio.file.Path.of(dir))
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("_bloom-g")).toSeq
      } finally ls.close()
    }
    assert(names.length == 1 && names.head.startsWith("_bloom-g1~"), names.toString)

    val (cands, pruned, total) = MergeTable.bloomCandidatePaths(spark, dir, "tag", "fresh-tag")
    assert(total == 8 && pruned >= 6, s"rebuilt index should prune again: $pruned/$total")
    assert(MergeTable.scanEqualsBloom(spark, dir, "tag", "fresh-tag")
      .select("k").as[Long].collect().toSeq == Seq(50L))
    assert(cands.size <= 2)
  }
}
