package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Edge semantics of the distributed exact quantile: must match the
  * built-in interpolated `percentile` (= DuckDB quantile_cont) on
  * every boundary case the rank selection could get wrong.
  */
class QuantilesSpec extends SparkSpecBase {
  import spark.implicits._

  private def q(df: org.apache.spark.sql.DataFrame, p: Double): Map[String, Double] =
    Quantiles.groupQuantile(df, "k", "v", p, nParts = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("matches the buffering percentile on interpolated and integral positions") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),            // n=4
      ("b", 10.0), ("b", 20.0), ("b", 30.0), ("b", 40.0), ("b", 50.0)) // n=5
      .toDF("k", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)) {
      val expected = df.groupBy("k").agg(expr(s"percentile(v, $p)").as("e"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = q(df, p)
      expected.foreach { case (k, e) =>
        assert(math.abs(got(k) - e) < 1e-12, s"p=$p key=$k: ${got(k)} vs $e")
      }
    }
  }

  test("single-element groups return their value at any quantile") {
    val df = Seq(("x", 7.5), ("y", -3.0)).toDF("k", "v")
    for (p <- Seq(0.0, 0.5, 0.95, 1.0))
      assert(q(df, p) == Map("x" -> 7.5, "y" -> -3.0))
  }

  test("nulls are ignored, all-null groups produce no row") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("z", None)).toDF("k", "v")
    val got = q(df, 0.5)
    assert(got == Map("a" -> 2.0), s"got $got")
  }

  test("a NULL key is a group like any other (null-safe rank joins, r20)") {
    val df = Seq(
      (Option("a"), 1.0), (Option("a"), 3.0),
      (Option.empty[String], 10.0), (Option.empty[String], 20.0),
      (Option.empty[String], 30.0))
      .toDF("k", "v")
    val got = Quantiles.groupQuantile(df, "k", "v", 0.5, nParts = 4)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    // percentile's groupBy emits a row for the null group; the old
    // USING joins silently dropped every null-key row
    val expected = df.groupBy("k").agg(expr("percentile(v, 0.5D)").as("e"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(got == expected, s"got $got, want $expected")
    assert(got.contains(None) && got(None) == 20.0)
  }

  test("multi-quantile pass agrees with per-quantile calls") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("k", "v")
    val qs = Seq(0.25, 0.5, 0.9)
    val multi = Quantiles.groupQuantiles(df, "k", "v", qs, nParts = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    qs.foreach { p =>
      val single = q(df, p)
      single.foreach { case (k, e) =>
        assert(math.abs(multi((k, p)) - e) < 1e-12, s"($k, $p)")
      }
    }
    assert(multi.size == qs.size * 2)
  }

  test("duplicate values spanning bucket boundaries rank consistently") {
    // 100 equal values force ties across the 4 range buckets
    val df = (1 to 100).map(_ => ("d", 5.0)).toDF("k", "v")
    for (p <- Seq(0.1, 0.5, 0.9)) assert(q(df, p) == Map("d" -> 5.0))
  }

  test("key columns named like former internal names resolve correctly") {
    // "v" / "n" / "bkt" used to collide with the working columns
    for (key <- Seq("v", "n", "bkt", "frac")) {
      val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0))
        .toDF(key, "x")
      val got = Quantiles.groupQuantile(df, key, "x", 0.5, nParts = 4)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("a" -> 2.0, "b" -> 10.0), s"key=$key: $got")
    }
  }

  test("output-colliding key names are rejected up front") {
    val df = Seq(("a", 1.0)).toDF("q", "x")
    intercept[IllegalArgumentException] {
      Quantiles.groupQuantiles(df, "q", "x", Seq(0.5))
    }
  }
}
