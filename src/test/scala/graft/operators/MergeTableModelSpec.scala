package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Model-based randomized property over the WHOLE MergeTable DML
  * surface: seeded random sequences of merge / deleteWhere /
  * updateWhere / deleteKeys / compact / recluster / reclusterPartial /
  * restore against a trivial in-memory model (a Map), asserting after
  * EVERY op that readTable ≡ model, that time travel to any earlier
  * generation reproduces that generation's model snapshot, and that
  * the CDC diff of each committed step applied to the previous
  * snapshot yields the next — the cross-operator interactions (a
  * deletion vector surviving a recluster, a restore swapping vectors,
  * a compact materializing them) that per-operator specs exercise
  * only in hand-picked pairs. Seeded, so a failure reproduces.
  *
  * Two ops close the lifecycle loop (r20 fuzz campaign): VACUUM
  * prunes the model's snapshot map to the current generation and
  * asserts every swept generation now fails time travel AND restore
  * LOUDLY (never silently re-resolving); CLONE pins the model at
  * clone time and the end-of-run check asserts each clone still
  * reads exactly its pinned snapshot — unless a SOURCE vacuum ran
  * after the clone, in which case the documented shallow-clone trade
  * applies: the read may fail loudly, but a SUCCESSFUL read must
  * still be exactly the pinned rows (loud-or-right, never partial).
  *
  * Fuzz knobs (committed defaults = the suite's cost envelope):
  * SPARK_GRAFT_MODEL_SEQS / SPARK_GRAFT_MODEL_STEPS /
  * SPARK_GRAFT_MODEL_SEED let a hunt run hundreds of sequences
  * without a code edit; a failure's seq/step/op all print with the
  * seed, so any hit replays exactly.
  */
class MergeTableModelSpec extends SparkSpecBase {
  import spark.implicits._

  private def envInt(name: String, dflt: Int): Int =
    sys.env.get(name).flatMap(_.toIntOption).filter(_ >= 1).getOrElse(dflt)
  private val nSeqs = envInt("SPARK_GRAFT_MODEL_SEQS", 2)
  private val nSteps = envInt("SPARK_GRAFT_MODEL_STEPS", 10)
  private val seed = sys.env.get("SPARK_GRAFT_MODEL_SEED")
    .flatMap(_.toLongOption).getOrElse(20260816L)

  private type Model = Map[Long, (String, Double)]

  private def frameOf(m: Model) =
    m.toSeq.map { case (k, (seg, bal)) => (k, seg, bal) }
      .toDF("k", "seg", "bal")

  private def read(dir: String, asOf: Option[Int] = None): Model =
    MergeTable.readTable(spark, dir, asOf)
      .select("k", "seg", "bal").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("random DML sequences: reads, time travel and CDC all match the model") {
    val rnd = new scala.util.Random(seed)
    (1 to nSeqs).foreach { seq =>
      val dir = tmpDir(s"mergetab-model$seq")
      var model: Model = (1 to 200).map(k =>
        k.toLong -> ((s"s${k % 5}", k * 1.5))).toMap
      MergeTable.write(spark, frameOf(model), "k", dir, nFiles = 8)
      // committed-generation → model snapshot (restore/time-travel truth);
      // vacuum prunes this to the current generation — swept manifests
      // must fail loudly, so they leave the truth map too
      val snaps = scala.collection.mutable.Map(0 -> model)
      // clone dir → (pinned model, whether a SOURCE vacuum ran after)
      val clones = scala.collection.mutable.Map
        .empty[String, (Model, Boolean)]
      var nextKey = 1000L

      def commitIfAdvanced(op: String): Unit = {
        val g = MergeTable.committedGen(dir).get
        snaps(g) = model
        val got = read(dir)
        assert(got == model,
          s"seq $seq after $op (gen $g): table diverged from model — " +
            s"extra=${(got.keySet -- model.keySet).toSeq.sorted.take(5)} " +
            s"missing=${(model.keySet -- got.keySet).toSeq.sorted.take(5)}")
      }

      (1 to nSteps).foreach { step =>
        val live = model.keys.toIndexedSeq.sorted
        rnd.nextInt(10) match {
          case 0 => // banded merge: U/D on existing keys, I on fresh
            val us = rnd.shuffle(live).take(1 + rnd.nextInt(8))
            val ds = rnd.shuffle(live.filterNot(us.contains)).take(rnd.nextInt(6))
            val is = (0 until rnd.nextInt(5)).map { _ => nextKey += 1; nextKey }
            val batch =
              us.map(k => (k, "U", "WEB", model(k)._2 + 100.0)) ++
                ds.map(k => (k, "D", null: String, 0.0)) ++
                is.map(k => (k, "I", "NEW", k * 0.5))
            if (batch.nonEmpty) {
              MergeTable.merge(spark, dir,
                batch.toDF("k", "op", "seg", "bal"), "k")
              model = model -- ds ++
                us.map(k => k -> (("WEB", model(k)._2 + 100.0))) ++
                is.map(k => k -> (("NEW", k * 0.5)))
              commitIfAdvanced(s"merge(${us.size}U/${ds.size}D/${is.size}I)")
            }
          case 1 => // predicate DELETE on a key band
            if (live.nonEmpty) {
              val lo = live(rnd.nextInt(live.size))
              val hi = lo + rnd.nextInt(40)
              MergeTable.deleteWhere(spark, dir, "k", "k", Some(lo), Some(hi))
              val before = model.size
              model = model.filterNot { case (k, _) => k >= lo && k <= hi }
              if (model.size != before) commitIfAdvanced(s"deleteWhere[$lo,$hi]")
            }
          case 2 => // predicate UPDATE on a key band
            if (live.nonEmpty) {
              val lo = live(rnd.nextInt(live.size))
              val hi = lo + rnd.nextInt(40)
              MergeTable.updateWhere(spark, dir, "k", "k", Some(lo), Some(hi),
                Map("seg" -> lit("HIT"), "bal" -> (col("bal") + 10)))
              val hits = model.count { case (k, _) => k >= lo && k <= hi }
              model = model.map { case (k, (s0, b)) =>
                if (k >= lo && k <= hi) k -> (("HIT", b + 10)) else k -> ((s0, b)) }
              if (hits > 0) commitIfAdvanced(s"updateWhere[$lo,$hi]")
            }
          case 3 => // scattered deletion-vector delete
            val doomed = rnd.shuffle(live).take(rnd.nextInt(6))
            if (doomed.nonEmpty) {
              val st = MergeTable.deleteKeys(spark, dir, "k", doomed)
              model = model -- doomed
              if (st.touched.nonEmpty) commitIfAdvanced(s"deleteKeys(${doomed.size})")
            }
          case 4 => // compact (materializes any standing vector)
            val n = MergeTable.readTable(spark, dir).count()
            if (n > 0) {
              MergeTable.compact(spark, dir, "k", targetRows = math.max(1L, n))
              commitIfAdvanced("compact")
            }
          case 5 => // full z-recluster
            if (model.nonEmpty) {
              MergeTable.recluster(spark, dir, "k", Seq("k", "bal"), nFiles = 6)
              commitIfAdvanced("recluster")
            }
          case 6 => // partial recluster (chains off the last cluster commit)
            if (model.nonEmpty) {
              MergeTable.reclusterPartial(spark, dir, "k", Seq("k", "bal"))
              commitIfAdvanced("reclusterPartial")
            }
          case 7 => // restore to a random earlier LIVE generation (a
            // vacuum prunes snaps, so swept targets never get picked —
            // the vacuum op itself asserts they fail loudly)
            val g = MergeTable.committedGen(dir).get
            val targets = snaps.keys.filter(_ < g).toIndexedSeq.sorted
            if (targets.nonEmpty) {
              val target = targets(rnd.nextInt(targets.size))
              MergeTable.restore(spark, dir, target)
              model = snaps(target)
              commitIfAdvanced(s"restore($target)")
            }
          case 8 => // shallow clone: pin the model; re-checked at end of
            // run (later SOURCE ops must never leak into the clone)
            val dst = tmpDir(s"mergetab-model$seq-clone") + "/t"
            MergeTable.cloneTable(spark, dir, dst)
            clones(dst) = (model, false)
            assert(read(dst) == model,
              s"seq $seq step $step: fresh clone diverged from the model")
          case _ => // vacuum: every swept generation must fail time
            // travel AND restore loudly — never silently re-resolve
            val g = MergeTable.committedGen(dir).get
            MergeTable.vacuum(spark, dir)
            snaps.keys.filter(_ != g).toSeq.sorted.foreach { og =>
              val t = intercept[Exception](read(dir, asOf = Some(og)))
              assert(String.valueOf(t.getMessage).contains("vacuum"),
                s"seq $seq: time travel to swept gen $og failed with the " +
                  s"wrong shape: $t")
              val r = intercept[Exception](MergeTable.restore(spark, dir, og))
              assert(String.valueOf(r.getMessage).contains("vacuum"),
                s"seq $seq: restore to swept gen $og failed with the " +
                  s"wrong shape: $r")
            }
            snaps.filterInPlace((k, _) => k == g)
            clones.mapValuesInPlace((_, v) => (v._1, true))
            commitIfAdvanced("vacuum") // gen pinned; reads still ≡ model
        }
      }

      // time travel: every still-live generation reproduces its snapshot
      snaps.keys.toSeq.sorted.foreach { g =>
        assert(read(dir, asOf = Some(g)) == snaps(g),
          s"seq $seq: time travel to gen $g diverged from its snapshot")
      }
      // clones: loud-or-right. A clone whose source never vacuumed
      // after it must read exactly its pinned snapshot; once a source
      // vacuum ran, the documented shallow-clone trade allows a LOUD
      // failure — but a successful read must still be the pinned rows
      clones.foreach { case (cdir, (pinned, srcVacuumedAfter)) =>
        scala.util.Try(read(cdir)) match {
          case scala.util.Success(got) =>
            assert(got == pinned,
              s"seq $seq: clone $cdir diverged from its pinned snapshot — " +
                s"extra=${(got.keySet -- pinned.keySet).take(3)} " +
                s"missing=${(pinned.keySet -- got.keySet).take(3)}")
          case scala.util.Failure(e) =>
            assert(srcVacuumedAfter,
              s"seq $seq: clone $cdir unreadable with NO source vacuum " +
                s"after it: $e")
        }
      }
      // CDC: each adjacent committed span's post-only diff applied to
      // the earlier snapshot yields the later one (I/U put, D remove)
      val gens = snaps.keys.toSeq.sorted
      gens.zip(gens.tail).foreach { case (a, b) =>
        val delta = MergeTable.changesBetween(spark, dir, a, b, "k")
          .select("k", "change_op", "seg", "bal").collect()
        val applied = delta.foldLeft(snaps(a)) { (m, r) =>
          if (r.getString(1) == "D") m - r.getLong(0)
          else m + (r.getLong(0) -> ((r.getString(2), r.getDouble(3))))
        }
        assert(applied == snaps(b),
          s"seq $seq: CDC($a->$b) applied to snapshot($a) != snapshot($b)")
      }
    }
  }
}
