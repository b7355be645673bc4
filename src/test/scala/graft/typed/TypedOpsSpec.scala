package graft.typed

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class TypedOpsSpec extends SparkSpecBase {

  test("typed datasets decode every row of the star schema") {
    assert(TypedOps.lineitems(spark, sfDir).head().l_orderkey > 0)
    assert(TypedOps.orders(spark, sfDir).count() ==
      Tables.orders(spark, sfDir).count())
    assert(TypedOps.documents(spark, sfDir).head().text.nonEmpty)
  }

  test("typed groupByKey revenue matches the untyped aggregation") {
    val typed = TypedOps.revenueByFlag(spark, sfDir).collect()
      .map { case (k, v) => k -> math.round(v) }.toMap
    val untyped = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
    assert(typed == untyped)
  }
}
