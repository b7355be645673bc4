package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Concurrent model-based property over MIXED DML: three writers run
  * random interleaved merges (inserts and updates), deletion-vector
  * deletes and compactions against ONE table, each retrying on the
  * generation CAS like a production writer. The single-op OCC spec
  * (MergeTableSpec's 6-writer merge storm) proves the CAS for one
  * homogeneous op; this one crosses the op FAMILIES — a dv commit
  * racing a compact that drains vectors, an insert racing the rewrite
  * of the file it lands beside — under seeded random schedules.
  *
  * The model stays deterministic under ANY interleaving by key
  * ownership: thread t owns the keys ≡ t (mod 3) plus its private
  * insert range, and only the owner ever writes a key, so the final
  * table must equal the UNION of the per-thread models no matter how
  * the commits serialized. Assertions: exactly-once (every
  * row-changing op's committed generation is distinct — a duplicate
  * means two writers shared a CAS win), no lost updates (table ≡
  * union of models), time travel to gen 0 intact, and the WHOLE
  * concurrent history nets through one CDC read (changesBetween(0,
  * head) applied to the initial model reproduces the final state —
  * deletion vectors, compact rewrites and all).
  *
  * Same fuzz knobs as the sequential model specs:
  * SPARK_GRAFT_MODEL_STEPS (ops per writer) / SPARK_GRAFT_MODEL_SEED.
  */
class ConcurrentDmlModelSpec extends SparkSpecBase {
  import spark.implicits._

  private val nSteps = sys.env.get("SPARK_GRAFT_MODEL_STEPS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(5)
  private val seed = sys.env.get("SPARK_GRAFT_MODEL_SEED")
    .flatMap(_.toLongOption).getOrElse(20260816L)

  private type Model = Map[Long, (String, Double)]

  test("concurrent mixed DML linearizes: exactly-once commits, no lost updates, CDC nets") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("conc-dml")
    val nThreads = 3
    val initial: Model = (0 until 300).map(k =>
      k.toLong -> ((s"s${k % 5}", k * 1.5))).toMap
    MergeTable.write(spark,
      initial.toSeq.map { case (k, (seg, bal)) => (k, seg, bal) }
        .toDF("k", "seg", "bal"), "k", dir, nFiles = 6)

    val models = Array.fill(nThreads)(
      scala.collection.mutable.Map.empty[Long, (String, Double)])
    (0 until nThreads).foreach(t => models(t) ++=
      initial.filter { case (k, _) => k % nThreads == t })
    val committedGens = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val conflicts = new java.util.concurrent.atomic.AtomicInteger

    def retrying[A](body: => A): A = {
      var tries = 0
      while (true) {
        tries += 1
        try return body
        catch { case _: java.util.ConcurrentModificationException if tries < 50 =>
          conflicts.incrementAndGet() }
      }
      sys.error("unreachable")
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    (0 until nThreads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          val rnd = new scala.util.Random(seed * 31 + t)
          val model = models(t)
          var nextId = 1000000L * (t + 1)
          (1 to nSteps).foreach { _ =>
            val live = model.keys.toIndexedSeq.sorted
            rnd.nextInt(4) match {
              case 0 => // insert fresh keys from the thread's private range
                val ks = (0 to rnd.nextInt(3)).map { _ =>
                  // ownership holds because the 1M-spaced per-thread
                  // blocks are disjoint from each other and the base
                  nextId += nThreads; nextId
                }
                val st = retrying(MergeTable.merge(spark, dir,
                  ks.map(k => (k, "I", "NEW", k * 0.25))
                    .toDF("k", "op", "seg", "bal"), "k"))
                committedGens.add(st.gen)
                ks.foreach(k => model(k) = ("NEW", k * 0.25))
              case 1 if live.nonEmpty => // update own keys (values from
                // the LOCAL model — deterministic: only the owner writes them)
                val ks = rnd.shuffle(live).take(1 + rnd.nextInt(4))
                val st = retrying(MergeTable.merge(spark, dir,
                  ks.map(k => (k, "U", "HIT", model(k)._2 + 7.0))
                    .toDF("k", "op", "seg", "bal"), "k"))
                committedGens.add(st.gen)
                ks.foreach(k => model(k) = ("HIT", model(k)._2 + 7.0))
              case 2 if live.nonEmpty => // scattered dv delete of own keys
                val ks = rnd.shuffle(live).take(1 + rnd.nextInt(3))
                val st = retrying(
                  MergeTable.deleteKeys(spark, dir, "k", ks: Seq[Any]))
                committedGens.add(st.gen)
                ks.foreach(model.remove)
              case _ => // compact: row-invariant maintenance pressure
                // (drains standing vectors; may no-op — gen not recorded)
                retrying(MergeTable.compact(spark, dir, "k",
                  targetRows = 1000000L))
            }
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(600, java.util.concurrent.TimeUnit.SECONDS),
      "concurrent DML writers did not finish")
    assert(failures.isEmpty,
      s"writer failed: ${failures.asScala.map(_.toString).toSeq}")

    // exactly-once: every row-changing op owns a distinct generation
    val gens = committedGens.asScala.toSeq
    assert(gens.distinct.size == gens.size,
      s"two row-changing ops shared a committed generation: " +
        s"${gens.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted}")

    def read(asOf: Option[Int] = None): Model =
      MergeTable.readTable(spark, dir, asOf)
        .select("k", "seg", "bal").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

    // no lost updates: the table is exactly the union of what each
    // owner believes, regardless of how the commits interleaved
    val expected: Model = models.flatMap(_.toSeq).toMap
    val got = read()
    assert(got == expected,
      s"table diverged from the ownership model (conflicts=${conflicts.get}) — " +
        s"extra=${(got.keySet -- expected.keySet).toSeq.sorted.take(5)} " +
        s"missing=${(expected.keySet -- got.keySet).toSeq.sorted.take(5)}")

    // history intact at both ends
    assert(read(asOf = Some(0)) == initial,
      "time travel to gen 0 no longer reproduces the initial snapshot")
    val head = MergeTable.committedGen(dir).get
    val delta = MergeTable.changesBetween(spark, dir, 0, head, "k")
      .select("k", "change_op", "seg", "bal").collect()
    val replayed = delta.foldLeft(initial) { (m, r) =>
      if (r.getString(1) == "D") m - r.getLong(0)
      else m + (r.getLong(0) -> ((r.getString(2), r.getDouble(3))))
    }
    assert(replayed == expected,
      "CDC(0 -> head) applied to the initial snapshot did not reproduce " +
        "the concurrent end state")
  }
}
