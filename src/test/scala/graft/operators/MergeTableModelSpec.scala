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
  */
class MergeTableModelSpec extends SparkSpecBase {
  import spark.implicits._

  private type Model = Map[Long, (String, Double)]

  private def frameOf(m: Model) =
    m.toSeq.map { case (k, (seg, bal)) => (k, seg, bal) }
      .toDF("k", "seg", "bal")

  private def read(dir: String, asOf: Option[Int] = None): Model =
    MergeTable.readTable(spark, dir, asOf)
      .select("k", "seg", "bal").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("random DML sequences: reads, time travel and CDC all match the model") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 2).foreach { seq =>
      val dir = tmpDir(s"mergetab-model$seq")
      var model: Model = (1 to 200).map(k =>
        k.toLong -> ((s"s${k % 5}", k * 1.5))).toMap
      MergeTable.write(spark, frameOf(model), "k", dir, nFiles = 8)
      // committed-generation → model snapshot (restore/time-travel truth)
      val snaps = scala.collection.mutable.Map(0 -> model)
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

      (1 to 10).foreach { step =>
        val live = model.keys.toIndexedSeq.sorted
        rnd.nextInt(8) match {
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
          case _ => // restore to a random earlier generation
            val g = MergeTable.committedGen(dir).get
            if (g > 0) {
              val target = rnd.nextInt(g)
              MergeTable.restore(spark, dir, target)
              model = snaps(target)
              commitIfAdvanced(s"restore($target)")
            }
        }
      }

      // time travel: every committed generation reproduces its snapshot
      snaps.keys.toSeq.sorted.foreach { g =>
        assert(read(dir, asOf = Some(g)) == snaps(g),
          s"seq $seq: time travel to gen $g diverged from its snapshot")
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
