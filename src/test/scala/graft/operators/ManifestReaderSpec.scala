package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** r21 equivalence oracle for the driver-side manifest row reader:
  * MergeTable.manifestRowsAt must return exactly what
  * `spark.read.parquet(manifest).collect()` returns — same schema,
  * same rows (as multisets; parquet row order within one file is
  * stable anyway) — across real manifest shapes: fresh writes, merges
  * whose carried rows were filtered through a local relation, schema
  * evolution (allowMissingColumns union → null stat cells), string
  * keys with truncated bounds, and the generation spans time travel
  * reads.
  */
class ManifestReaderSpec extends SparkSpecBase {

  private def assertAgree(dir: String, gen: Int): Unit = {
    val (schema, fast) = MergeTable.manifestRowsAt(spark, dir, gen)
    val slow = MergeTable.manifestAt(spark, dir, gen)
    assert(schema == slow.schema,
      s"schema diverges:\n  driver=$schema\n  spark=${slow.schema}")
    val f = fast.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val sl = slow.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(f == sl, s"rows diverge at gen $gen:\n  driver=$f\n  spark=$sl")
  }

  test("driver manifest read ≡ spark read: write, merge, evolution, time travel") {
    import spark.implicits._
    val dir = tmpDir("manread")
    val base = (1 to 300).map(i => (i.toLong, s"seg${i % 3}", i * 1.5))
      .toDF("k", "seg", "bal")
    MergeTable.write(spark, base, "k", dir, nFiles = 4)
    assertAgree(dir, 0)
    // merge introducing a NEW column: the union carries old rows with
    // null cells for the new column's stats
    val changes = Seq(
      (10L, "U", "WEB", 9.0, "noteA"),
      (4000L, "I", "NEW", 1.0, "noteB"))
      .toDF("k", "op", "seg", "bal", "note")
    MergeTable.merge(spark, dir, changes, "k")
    assertAgree(dir, 1)
    assertAgree(dir, 0) // time travel still agrees
    MergeTable.compact(spark, dir, "k", targetRows = 1000)
    assertAgree(dir, MergeTable.committedGen(dir).get)
  }

  test("driver manifest read ≡ spark read: string keys (truncated bounds)") {
    import spark.implicits._
    val dir = tmpDir("manread-str")
    val base = (1 to 200).map(i => (f"user-$i%05d-" + "x" * 60, i * 2.0))
      .toDF("k", "bal")
    MergeTable.write(spark, base, "k", dir, nFiles = 4)
    assertAgree(dir, 0)
  }
}
