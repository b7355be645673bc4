package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** CHECK constraints: add-time validation of existing rows, merge /
  * updateWhere rejection with the table left untouched, ANSI
  * NULL-passes semantics, and drop re-admitting.
  */
class ConstraintsSpec extends SparkSpecBase {
  import spark.implicits._

  private def table(n: Int) =
    (1 to n).map(k => (k.toLong, s"seg${k % 4}", k * 1.5)).toDF("k", "seg", "bal")

  test("constraints gate merge and updateWhere; violations leave the table untouched") {
    val dir = tmpDir("constab")
    MergeTable.write(spark, table(100), "k", dir, nFiles = 4)
    MergeTable.addCheckConstraint(spark, dir, "bal-positive", "bal > 0")
    MergeTable.addCheckConstraint(spark, dir, "seg-not-null", "seg IS NOT NULL")
    assert(MergeTable.checkConstraints(dir).keySet ==
      Set("bal-positive", "seg-not-null"))

    // a valid merge passes
    MergeTable.merge(spark, dir,
      Seq((200L, "I", "NEW", 1.0)).toDF("k", "op", "seg", "bal"), "k")
    assert(MergeTable.committedGen(dir).contains(1))

    // a violating INSERT is rejected, generation does not advance
    val ex = intercept[IllegalStateException] {
      MergeTable.merge(spark, dir,
        Seq((201L, "I", "NEW", -5.0)).toDF("k", "op", "seg", "bal"), "k")
    }
    assert(ex.getMessage.contains("bal-positive"), ex.getMessage)
    assert(MergeTable.committedGen(dir).contains(1))
    assert(MergeTable.readTable(spark, dir).filter(col("bal") <= 0).count() == 0)

    // an UPDATE driving a row out of bounds is rejected too
    val ex2 = intercept[IllegalStateException] {
      MergeTable.merge(spark, dir,
        Seq((10L, "U", "WEB", -1.0)).toDF("k", "op", "seg", "bal"), "k")
    }
    assert(ex2.getMessage.contains("bal-positive"))
    val ex3 = intercept[IllegalStateException] {
      MergeTable.updateWhere(spark, dir, "k", "k", Some(5L), Some(15L),
        Map("bal" -> lit(-2.0)))
    }
    assert(ex3.getMessage.contains("bal-positive"))
    assert(MergeTable.committedGen(dir).contains(1))
    assert(MergeTable.readTable(spark, dir).count() == 101)

    // drop re-admits
    assert(MergeTable.dropCheckConstraint(dir, "bal-positive"))
    assert(!MergeTable.dropCheckConstraint(dir, "bal-positive"))
    MergeTable.merge(spark, dir,
      Seq((201L, "I", "NEW", -5.0)).toDF("k", "op", "seg", "bal"), "k")
    assert(MergeTable.readTable(spark, dir).filter(col("k") === 201L).count() == 1)
  }

  test("add-time validation scans existing rows; NULL is UNKNOWN and passes") {
    val dir = tmpDir("consnull")
    val t = Seq((1L, Some(5.0)), (2L, None), (3L, Some(7.0))).toDF("k", "bal")
    MergeTable.write(spark, t, "k", dir, nFiles = 2)

    // existing row 2 has NULL bal: UNKNOWN passes ANSI CHECK
    MergeTable.addCheckConstraint(spark, dir, "bal-pos", "bal > 0")
    // and a NULL-bal insert passes enforcement too
    MergeTable.merge(spark, dir,
      Seq((4L, "I", None: Option[Double])).toDF("k", "op", "bal"), "k")
    assert(MergeTable.readTable(spark, dir).count() == 4)

    // a constraint the existing data violates is refused at add time
    val ex = intercept[IllegalStateException] {
      MergeTable.addCheckConstraint(spark, dir, "bal-large", "bal > 6")
    }
    assert(ex.getMessage.contains("bal-large"))
    assert(MergeTable.checkConstraints(dir).keySet == Set("bal-pos"))

    // duplicate names, malformed names, and multi-line expressions are
    // refused (the store is line-oriented — a newline would corrupt it
    // and brick every later mutation's parse)
    intercept[IllegalArgumentException] {
      MergeTable.addCheckConstraint(spark, dir, "bal-pos", "bal > 0")
    }
    intercept[IllegalArgumentException] {
      MergeTable.addCheckConstraint(spark, dir, "bad name!", "bal > 0")
    }
    intercept[IllegalArgumentException] {
      MergeTable.addCheckConstraint(spark, dir, "ml", "bal > 0 AND\nbal < 9")
    }
    assert(MergeTable.checkConstraints(dir).keySet == Set("bal-pos"))
  }
}
