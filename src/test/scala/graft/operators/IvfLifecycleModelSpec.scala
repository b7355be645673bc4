package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based sequential property for the IVF index lifecycle:
  * seeded random sequences of append / tombstone / vacuum / compact /
  * rebuild against the trivial model (the physically-live vec_id set
  * and the tombstoned subset). ANN probes are approximate, so the
  * probe assertions are CONTAINMENT, not equality: every answer id
  * must be a live, un-tombstoned vector, and governance must hold
  * through every maintenance op — including a rebuild, which swaps
  * vectors + centroids + codebooks under the CAS and must neither
  * lose a vector nor resurrect a doomed one. Completes the
  * model-property trio (MergeTableModelSpec, LshStoreModelSpec).
  */
class IvfLifecycleModelSpec extends SparkSpecBase {
  import graft.similarity.Similarity
  import spark.implicits._

  private def embOf(ids: Seq[Long]): DataFrame =
    ids.toDF("vec_id").select(col("vec_id"),
      expr("transform(sequence(1, 16), j -> " +
        "cast(pmod(xxhash64(vec_id * 16 + j), 1000) as float) / 1000.0)")
        .as("embedding"))

  // fuzz knobs — same contract as MergeTableModelSpec's
  private val nSteps = sys.env.get("SPARK_GRAFT_MODEL_STEPS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(8)
  private val seed = sys.env.get("SPARK_GRAFT_MODEL_SEED")
    .flatMap(_.toLongOption).getOrElse(20260816L)

  test("random append/tombstone/vacuum/compact/rebuild sequences keep the model's invariants") {
    val rnd = new scala.util.Random(seed)
    val corpus = tmpDir("ivf-model-corpus")
    embOf((0L until 150L).toSeq).withColumn("label", lit("c"))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val dir = tmpDir("ivf-model-idx")
    Similarity.buildIvfIndex(spark, corpus, dir, nCells = 6, iters = 2, sampleMod = 1)
    var physical: Set[Long] = (0L until 150L).toSet
    var tombed: Set[Long] = Set.empty
    var nextId = 5000L
    val probes = Similarity.indexVectors(spark, dir)
      .filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("na"))
      .localCheckpoint()

    def check(op: String): Unit = {
      val ids = Similarity.indexVectors(spark, dir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(ids == physical,
        s"after $op: physical set diverged (extra=${(ids -- physical).take(3)}, " +
          s"missing=${(physical -- ids).take(3)})")
      assert(Similarity.vectorTombstones(spark, dir).count() == tombed.size.toLong,
        s"after $op: tombstone count diverged")
      val answers = Similarity.probeIvf(spark, dir, probes, nProbe = 3, k = 4)
        .select("n_id").collect().map(_.getLong(0)).toSet
      assert(answers.subsetOf(physical -- tombed),
        s"after $op: probe leaked a doomed/unknown id: " +
          s"${(answers -- (physical -- tombed)).take(3)}")
      assert(answers.nonEmpty, s"after $op: probe went vacuously empty")
    }

    check("build")
    (1 to nSteps).foreach { step =>
      rnd.nextInt(5) match {
        case 0 =>
          val ids = (0 until 10 + rnd.nextInt(20)).map { _ => nextId += 1; nextId }
          Similarity.appendToIvfIndex(spark, dir, embOf(ids))
          physical ++= ids
          check(s"append(${ids.size})")
        case 1 =>
          val doomed = rnd.shuffle((physical -- tombed).toSeq).take(rnd.nextInt(5))
          if (doomed.nonEmpty) {
            Similarity.tombstoneVectors(spark, dir, doomed.toDF("vec_id"))
            tombed ++= doomed
            check(s"tombstone(${doomed.size})")
          }
        case 2 =>
          val n = Similarity.vacuumVectorTombstones(spark, dir)
          assert(n == tombed.size.toLong, s"vacuum purged $n, model says ${tombed.size}")
          physical --= tombed
          tombed = Set.empty
          check("vacuum")
        case 3 =>
          Similarity.compactIvfCells(spark, dir, minFiles = 2)
          check("compact")
        case _ =>
          Similarity.rebuildIvfIndex(spark, dir)
          check("rebuild")
      }
    }
  }
}
