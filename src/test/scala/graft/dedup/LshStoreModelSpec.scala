package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based sequential property for the LSH posting store: seeded
  * random sequences of append / tombstone / vacuum / compact against
  * a trivial model (the set of live doc ids minus the tombstoned
  * ones), asserting after EVERY op that a governed probe equals the
  * direct formulation over exactly the model's documents — the
  * cross-op interactions (a tombstone registered between appends, a
  * vacuum racing nothing but following a compact, the bands deletion
  * vector surviving maintenance) that the targeted dd11/dd14 specs
  * exercise only in hand-picked orders. Hashes are deterministic, so
  * equality is exact. Seeded, so a failure reproduces.
  */
class LshStoreModelSpec extends SparkSpecBase {
  import spark.implicits._

  // fuzz knobs — same contract as MergeTableModelSpec's: committed
  // defaults are the suite's cost envelope, a hunt raises them by env
  private val nSteps = sys.env.get("SPARK_GRAFT_MODEL_STEPS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(8)
  private val seed = sys.env.get("SPARK_GRAFT_MODEL_SEED")
    .flatMap(_.toLongOption).getOrElse(20260816L)

  /** Synthetic corpus: ids 0..n-1 with 12-token texts; every doc with
    * id % 3 == 0 shares its text with id+1 (guaranteed est=1.0 pairs,
    * so probes are never vacuously empty).
    */
  private def docsOf(ids: Seq[Long]): DataFrame = {
    val contentId =
      col("doc_id") - when(col("doc_id") % 3 === 1, 1L).otherwise(0L)
    ids.toDF("doc_id").select(col("doc_id"),
      concat_ws(" ", (1 to 12).map(j =>
        concat(lit(s"w$j"),
          pmod(xxhash64(contentId * 31 + lit(j)), lit(200)))): _*).as("text"))
  }

  private def probePairs(s: SparkSession, idx: String, delta: DataFrame,
                         governed: Boolean): Set[(Long, Long)] = {
    val tomb = if (governed) Some(Dedup.tombstonesOf(s, idx)) else None
    Dedup.neardupDelta(s, Dedup.sigsOf(delta), idx, 0.5, tomb)
      .select("delta_id", "base_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Ground truth from the MODEL: the direct (no index) formulation
    * over exactly `live` docs — the dd11 spec's reference shape.
    */
  private def directPairs(liveDocs: DataFrame, delta: DataFrame): Set[(Long, Long)] = {
    val baseSigs = Dedup.sigsOf(liveDocs)
    val deltaSigs = Dedup.sigsOf(delta)
    Dedup.bandKeysOf(deltaSigs).toDF("delta_id", "bkey")
      .join(Dedup.bandKeysOf(baseSigs).toDF("base_id", "bkey"), Seq("bkey"))
      .select("delta_id", "base_id").distinct()
      .join(baseSigs.toDF("base_id", "base_sig"), Seq("base_id"))
      .join(deltaSigs.toDF("delta_id", "delta_sig"), Seq("delta_id"))
      .filter(Dedup.estJaccard(col("delta_sig"), col("base_sig")) >= 0.5)
      .select("delta_id", "base_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("random append/tombstone/vacuum/compact sequences match the model's probe") {
    val rnd = new scala.util.Random(seed)
    val idx = tmpDir("lsh-model")
    var live: Set[Long] = (0L until 120L).toSet
    var tombed: Set[Long] = Set.empty
    var nextId = 10000L
    Dedup.buildLshIndexFrom(docsOf(live.toSeq.sorted), idx)
    // the probe batch: copies of base texts (ids ≡ 1 mod 3 share
    // id-1's text) so matches always exist
    val delta = docsOf((90000L until 90030L).toSeq).localCheckpoint()

    def check(op: String): Unit = {
      val modelLive = (live -- tombed).toSeq.sorted
      val expected = directPairs(docsOf(modelLive), delta)
      val got = probePairs(spark, idx, delta, governed = true)
      assert(got == expected,
        s"after $op: governed probe != model (live=${live.size}, " +
          s"tombed=${tombed.size}; extra=${(got -- expected).take(3)}, " +
          s"missing=${(expected -- got).take(3)})")
    }

    check("build")
    (1 to nSteps).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // append a fresh batch (ids aligned to the 3-cycle so
          // some share texts with EXISTING bases via the same formula)
          val ids = (0 until 3 * (1 + rnd.nextInt(8))).map { _ => nextId += 1; nextId }
          Dedup.appendToLshIndex(spark, idx, Dedup.sigsOf(docsOf(ids)))
          live ++= ids
          check(s"append(${ids.size})")
        case 1 => // takedown registration: immediate on governed probes
          val doomed = rnd.shuffle(live.toSeq).take(rnd.nextInt(8))
          if (doomed.nonEmpty) {
            Dedup.tombstoneDocs(spark, idx, doomed.toDF("doc_id"))
            tombed ++= doomed
            check(s"tombstone(${doomed.size})")
          }
        case 2 => // vacuum: physical purge, tombstone set clears
          val n = Dedup.vacuumLshTombstones(spark, idx)
          assert(n == tombed.size.toLong,
            s"vacuum purged $n, model says ${tombed.size}")
          live --= tombed
          tombed = Set.empty
          check("vacuum")
          // post-vacuum, the UNGOVERNED probe equals the model too
          assert(probePairs(spark, idx, delta, governed = false) ==
            directPairs(docsOf((live -- tombed).toSeq.sorted), delta),
            "post-vacuum ungoverned probe diverged")
        case _ => // maintenance: fold fragments, drain any bands vector
          Seq("sigs" -> "doc_id", "bands" -> "bkey").foreach { case (t, k) =>
            graft.operators.MergeTable.compact(spark, idx + s"/$t", k,
              targetRows = 1000000L)
          }
          check("compact")
      }
    }
  }
}
