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
}
