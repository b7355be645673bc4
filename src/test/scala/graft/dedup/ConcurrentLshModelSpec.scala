package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Concurrent model-based property for the LSH posting store — the
  * third of the concurrent trio (ConcurrentDmlModelSpec on the table
  * DML surface, ConcurrentIvfModelSpec on the vector index): three
  * writers interleave signature/band appends, takedown registrations
  * and posting-table compactions against ONE store. Appends ride the
  * MergeTable generation CAS (internal retry), takedowns are
  * token-isolated files, compaction retries on a lost CAS — this
  * property crosses the three under seeded random schedules.
  *
  * Ownership (base docs ≡ t mod 3 + private 3-aligned insert blocks)
  * makes the model exact, and LSH probes are deterministic (seeded
  * hashes), so the assertions are strict equality: after the barrier
  * a governed probe must equal the direct no-index formulation over
  * exactly (base ∪ appends) − tombstoned, and ONE final vacuum must
  * purge exactly the union of the owners' doom sets with the
  * ungoverned probe agreeing afterwards.
  *
  * Same fuzz knobs: SPARK_GRAFT_MODEL_STEPS / SPARK_GRAFT_MODEL_SEED.
  */
class ConcurrentLshModelSpec extends SparkSpecBase {
  import spark.implicits._

  private val nSteps = sys.env.get("SPARK_GRAFT_MODEL_STEPS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(4)
  private val seed = sys.env.get("SPARK_GRAFT_MODEL_SEED")
    .flatMap(_.toLongOption).getOrElse(20260816L)

  /** LshStoreModelSpec's corpus shape: ids ≡ 1 (mod 3) share id-1's
    * text, so near-dup pairs exist by construction.
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

  test("concurrent append/tombstone/compact writers keep the posting store exact") {
    import scala.jdk.CollectionConverters._
    val nThreads = 3
    val idx = tmpDir("conc-lsh")
    val baseIds = (0L until 120L).toSeq
    Dedup.buildLshIndexFrom(docsOf(baseIds), idx)
    val delta = docsOf((90000L until 90030L).toSeq).localCheckpoint()

    val appended = Array.fill(nThreads)(
      scala.collection.mutable.Set.empty[Long])
    val tombed = Array.fill(nThreads)(
      scala.collection.mutable.Set.empty[Long])
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    (0 until nThreads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          val rnd = new scala.util.Random(seed * 13 + t)
          // private insert blocks (1M-spaced per thread — no overlap
          // at any fuzz depth), 3-ALIGNED so the content-sharing
          // formula keeps generating real near-dup pairs
          var nextBlock = 1000000L * (t + 1)
          val owned = scala.collection.mutable.Set.empty[Long]
          owned ++= baseIds.filter(_ % nThreads == t)
          def retryingCompact(): Unit = {
            var tries = 0
            while (tries < 30) {
              tries += 1
              try {
                Seq("sigs" -> "doc_id", "bands" -> "bkey").foreach {
                  case (tbl, k) => graft.operators.MergeTable.compact(
                    spark, s"$idx/$tbl", k, targetRows = 1000000L)
                }
                return
              } catch {
                case _: java.util.ConcurrentModificationException => ()
              }
            }
            sys.error("compact starved")
          }
          (1 to nSteps).foreach { _ =>
            rnd.nextInt(3) match {
              case 0 =>
                val ids = (0 until 3 * (1 + rnd.nextInt(3))).map { i =>
                  nextBlock + i
                }
                nextBlock += 300
                Dedup.appendToLshIndex(spark, idx,
                  Dedup.sigsOf(docsOf(ids)))
                appended(t) ++= ids
                owned ++= ids
              case 1 =>
                val doom = rnd.shuffle((owned -- tombed(t)).toSeq)
                  .take(1 + rnd.nextInt(4))
                if (doom.nonEmpty) {
                  Dedup.tombstoneDocs(spark, idx, doom.toDF("doc_id"))
                  tombed(t) ++= doom
                }
              case _ => retryingCompact()
            }
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(600, java.util.concurrent.TimeUnit.SECONDS),
      "concurrent LSH writers did not finish")
    assert(failures.isEmpty,
      s"writer failed: ${failures.asScala.map(_.toString).toSeq}")

    val live = baseIds.toSet ++ appended.flatMap(_.toSeq)
    val doomUnion = tombed.flatMap(_.toSeq).toSet
    // governed probe == direct formulation over the live-minus-doomed
    // model, regardless of how the commits interleaved
    val expected = directPairs(docsOf((live -- doomUnion).toSeq.sorted), delta)
    val got = probePairs(spark, idx, delta, governed = true)
    assert(got == expected,
      s"governed probe diverged (live=${live.size}, doomed=${doomUnion.size}) — " +
        s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")

    // one final vacuum purges exactly the union of the doom sets, and
    // the ungoverned probe then agrees with the model too
    val purged = Dedup.vacuumLshTombstones(spark, idx)
    assert(purged == doomUnion.size.toLong,
      s"vacuum purged $purged, owners registered ${doomUnion.size}")
    assert(probePairs(spark, idx, delta, governed = false) == expected,
      "post-vacuum ungoverned probe diverged from the model")
  }
}
