package graft.graph

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpecBase {
  import spark.implicits._

  test("cycle fixpoint: uniform ranks are exact on a 3-cycle") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = PageRank.pageRank(edges, iters = 7).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every node: deg 1, one in-edge; uniform 1/3 is the fixpoint of
    // (1-d)/n + d*(1/3) = 1/3 exactly, and no dangling mass exists
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-15, s"got $got"))
  }

  test("dangling mass: conserved, redistributed, equal to a driver recompute") {
    // b is a sink: its rank must recycle, not leak
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val d = 0.85
    val iters = 10
    val got = PageRank.pageRank(edges, d, iters).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver recompute with the same update order and formula
    var ra = 0.5
    var rb = 0.5
    for (_ <- 1 to iters) {
      val dm = rb // b has no out-edges
      val na = (1.0 - d) / 2 + d * (0.0 + dm / 2)
      val nb = (1.0 - d) / 2 + d * (ra + dm / 2)
      ra = na; rb = nb
    }
    assert(math.abs(got(1L) - ra) < 1e-12 && math.abs(got(2L) - rb) < 1e-12,
      s"got $got, expected ($ra, $rb)")
    assert(math.abs(got.values.sum - 1.0) < 1e-12, "mass not conserved")
  }

  test("convergence early stop: fixpoint graph halts before the iteration cap") {
    // a 4-cycle starts AT the fixpoint (uniform, no dangling mass) —
    // with tol on, the first delta check must certify convergence
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val (ranks, itersRun) = PageRank.pageRankConverged(
      cyc, iters = 50, checkpointEvery = 1, tol = 1e-9)
    assert(itersRun < 50, "converged graph ran to the iteration cap")
    assert(itersRun <= 3, s"fixpoint certification took $itersRun iterations")
    // early stop changes WHEN we stop, not WHAT we compute: ranks are
    // the same uniform fixpoint the full run produces
    val got = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.values.foreach(v => assert(math.abs(v - 0.25) < 1e-15, s"got $got"))
    val full = PageRank.pageRank(cyc, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == full.keySet)
    got.foreach { case (n, v) => assert(math.abs(v - full(n)) < 1e-12) }
    // tol = 0 (the default) never terminates early — pr01's registered
    // fixed-iteration output is unchanged by the feature
    val (_, itersDefault) = PageRank.pageRankConverged(cyc, iters = 7)
    assert(itersDefault == 7, "default tol=0 must run all iterations")
  }

  test("triangle counting canonicalizes its input: mirrored and self edges are folded") {
    // K4 fed as a mix of (a,b) and (b,a) mirrors plus self-loops must
    // count exactly like the canonical K4 — not inflate degrees
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val dirty = k4.map { case (a, b) => (b, a) } ++ k4 ++ Seq((1L, 1L), (3L, 3L))
    val got = PageRank.triangleCounts(dirty.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("triangle counting: K4 closed form, skewed star+clique counted once each") {
    // K4: 4 triangles, every node on exactly 3
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF("a", "b")
    val got = PageRank.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    // a hub star (no triangles) attached to one clique edge: the
    // degree orientation must still count each triangle exactly once
    // and give the hub only its single real triangle
    val star = (1L to 50L).map(i => (100L, 100L + i))
    val withTri = star ++ Seq((101L, 102L)) // closes (100,101,102)
    val got2 = PageRank.triangleCounts(withTri.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(100L -> 1L, 101L -> 1L, 102L -> 1L), s"got $got2")
  }

  test("fulfillment graph: mass conserved at corpus scale, ranks positive") {
    val ranks = PageRank.pageRank(PageRank.fulfillmentEdges(spark, sfDir))
    val agg = ranks.agg(sum("rank"), min("rank"), count(lit(1))).head()
    assert(math.abs(agg.getDouble(0) - 1.0) < 1e-9,
      s"rank mass ${agg.getDouble(0)} drifted from 1")
    assert(agg.getDouble(1) > 0.0, "a rank went non-positive")
    assert(agg.getLong(2) > 0)
    // structural property of the bipartite graph: suppliers are the
    // only nodes with in-edges (customers receive just the teleport +
    // recycled dangling share), so EVERY supplier with an in-edge
    // outranks every customer — the top of the ranking is exactly
    // the supplier set, up to the cut
    val nSup = PageRank.fulfillmentEdges(spark, sfDir)
      .select("dst").distinct().count()
    val top = PageRank.pr01_pagerank(spark, sfDir).collect()
    assert(top.length == 25)
    assert(top.count(_.getLong(0) >= 1000000000L) == math.min(nSup, 25L).toInt,
      s"expected the $nSup suppliers to occupy the top ranks")
  }
}
