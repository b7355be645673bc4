package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concurrent model-based property for the IVF index's ingest loop:
  * three writers interleave appends, tombstone registrations and cell
  * compactions against ONE persisted index. The sequential lifecycle
  * property (IvfLifecycleModelSpec) exercises these ops one at a
  * time; the manifest CAS, the tombstone store's token-isolated
  * registrations and compact's rebase-or-abort commit are each
  * spec'd in isolation — this one crosses them under seeded random
  * schedules, the ingest shape a production deployment actually runs
  * (appenders racing the maintenance pass racing takedowns).
  *
  * Ownership keeps the model deterministic: thread t appends ids
  * from its private 1M block and tombstones only ids it owns (its
  * own appends plus base ids ≡ t mod 3), so the end state must be
  * base ∪ appends with exactly the per-owner tombstone sets
  * registered — regardless of how the CAS serialized the commits.
  * After the barrier: physical id set exact, tombstone registry
  * exact, governed probes answer only live un-doomed ids, and ONE
  * final vacuum purges exactly the union of every owner's doom set.
  *
  * Same fuzz knobs as the other model specs:
  * SPARK_GRAFT_MODEL_STEPS (ops per writer) / SPARK_GRAFT_MODEL_SEED.
  */
class ConcurrentIvfModelSpec extends SparkSpecBase {
  import graft.similarity.Similarity
  import spark.implicits._

  private val nSteps = sys.env.get("SPARK_GRAFT_MODEL_STEPS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(4)
  private val seed = sys.env.get("SPARK_GRAFT_MODEL_SEED")
    .flatMap(_.toLongOption).getOrElse(20260816L)

  private def embOf(ids: Seq[Long]): DataFrame =
    ids.toDF("vec_id").select(col("vec_id"),
      expr("transform(sequence(1, 16), j -> " +
        "cast(pmod(xxhash64(vec_id * 16 + j), 1000) as float) / 1000.0)")
        .as("embedding"))

  test("concurrent append/tombstone/compact writers keep the index's invariants") {
    import scala.jdk.CollectionConverters._
    val nThreads = 3
    val corpus = tmpDir("conc-ivf-corpus")
    val baseIds = (0L until 150L).toSeq
    embOf(baseIds).withColumn("label", lit("c"))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val dir = tmpDir("conc-ivf-idx")
    Similarity.buildIvfIndex(spark, corpus, dir,
      nCells = 6, iters = 2, sampleMod = 1)

    val appended = Array.fill(nThreads)(
      scala.collection.mutable.Set.empty[Long])
    val tombed = Array.fill(nThreads)(
      scala.collection.mutable.Set.empty[Long])
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    (0 until nThreads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          val rnd = new scala.util.Random(seed * 17 + t)
          var nextId = 1000000L * (t + 1)
          val owned = scala.collection.mutable.Set.empty[Long]
          owned ++= baseIds.filter(_ % nThreads == t)
          (1 to nSteps).foreach { _ =>
            rnd.nextInt(3) match {
              case 0 => // append a private-block batch (CAS retries inside)
                val ids = (0 until 5 + rnd.nextInt(10)).map { _ =>
                  nextId += 1; nextId
                }
                Similarity.appendToIvfIndex(spark, dir,
                  embOf(ids).select("vec_id", "embedding"))
                appended(t) ++= ids
                owned ++= ids
              case 1 => // tombstone own un-doomed ids (token-isolated
                // registrations: concurrent writers never conflict)
                val doom = rnd.shuffle((owned -- tombed(t)).toSeq)
                  .take(1 + rnd.nextInt(4))
                if (doom.nonEmpty) {
                  Similarity.tombstoneVectors(spark, dir, doom.toDF("vec_id"))
                  tombed(t) ++= doom
                }
              case _ => // fold fragmented cells (rebase-or-retry inside)
                Similarity.compactIvfCells(spark, dir, minFiles = 2)
            }
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(600, java.util.concurrent.TimeUnit.SECONDS),
      "concurrent IVF writers did not finish")
    assert(failures.isEmpty,
      s"writer failed: ${failures.asScala.map(_.toString).toSeq}")

    // physical set: base ∪ every owner's appends — nothing lost to a
    // racing compact, nothing duplicated by a CAS retry
    val expectPhysical = baseIds.toSet ++ appended.flatMap(_.toSeq)
    def physical(): Set[Long] = Similarity.indexVectors(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val phys = physical()
    assert(phys == expectPhysical,
      s"physical set diverged: extra=${(phys -- expectPhysical).take(5)} " +
        s"missing=${(expectPhysical -- phys).take(5)}")
    // every compact dedups full rows, and appends are all-or-nothing:
    // no id may appear twice
    val physCount = Similarity.indexVectors(spark, dir).count()
    assert(physCount == expectPhysical.size.toLong,
      s"duplicate vectors: $physCount rows over ${expectPhysical.size} ids")

    // tombstone registry: exactly the disjoint union of owner dooms
    val expectTombed = tombed.flatMap(_.toSeq).toSet
    assert(Similarity.vectorTombstones(spark, dir).count() ==
      expectTombed.size.toLong, "tombstone registry diverged")

    // governed probes answer only live, un-doomed ids
    val probes = Similarity.indexVectors(spark, dir)
      .filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("na"))
      .localCheckpoint()
    val answers = Similarity.probeIvf(spark, dir, probes, nProbe = 3, k = 4)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(answers.nonEmpty, "probe went vacuously empty")
    assert(answers.subsetOf(expectPhysical -- expectTombed),
      s"probe leaked a doomed/unknown id: " +
        s"${(answers -- (expectPhysical -- expectTombed)).take(5)}")

    // one final vacuum purges exactly the union of the doom sets
    val purged = Similarity.vacuumVectorTombstones(spark, dir)
    assert(purged == expectTombed.size.toLong,
      s"vacuum purged $purged, owners registered ${expectTombed.size}")
    assert(physical() == expectPhysical -- expectTombed,
      "post-vacuum physical set diverged")
  }
}
