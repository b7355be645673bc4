package graft

class GraftSpec extends SparkSpecBase {

  test("front door: views + SQL functions + query lookup work together") {
    functions.GraftExtensions.register(spark)
    Graft.registerViews(spark, sfDir)
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()(0).getLong(0)
    assert(n == 6000)
    val joined = spark.sql(
      """SELECT r_name, count(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(joined.length == 5)
    val ev = spark.sql("SELECT count(*) FROM events").collect()(0).getLong(0)
    assert(ev == 1000)
    assert(Graft.query("q01_wordcount")(spark, sfDir).count() > 0)
  }

  test("calib workload: deterministic, generated input, exactly one shuffle") {
    // the bench's host-calibration yardstick must never vary for a
    // DATA reason — same buckets and checksums on independent runs
    val a = Bench.calibWorkload(spark).orderBy("bucket").collect()
    val b = Bench.calibWorkload(spark.newSession()).orderBy("bucket").collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq, "calib workload not deterministic")
    // one shuffle only (the 4096-bucket aggregate); no file scan —
    // a read would couple the yardstick to page-cache state. String
    // check because AQE wraps the physical plan in an adaptive root
    // whose children aren't traversable pre-execution.
    val s = Bench.calibWorkload(spark).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllMatchIn(s).size == 1, s)
    assert(!s.contains("FileScan") && !s.contains("Scan parquet"), s)
  }
}
