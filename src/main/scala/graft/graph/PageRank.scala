package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2 graph analytics beside dedup's connected components: PageRank
  * with damping and dangling-mass redistribution — the standard
  * iterative-on-Spark shape (the reference has no graph surface;
  * this is part of the beyond-reference pipeline set, like the ANN
  * and sketch families).
  *
  * Scale posture mirrors dedup/ConnectedComponents.scala: every
  * iteration is ONE keyed join (edges ⋈ ranks on src — both sides
  * hash-partitioned on the same key, so a cluster reuses the
  * exchange) plus ONE keyed aggregation (contributions by dst);
  * `localCheckpoint` every few rounds truncates the growing lineage
  * so round N's plan doesn't replay rounds 1..N-1. The dangling mass
  * (rank parked on sink nodes) is a one-double collect per round —
  * driver-sized by definition — folded back uniformly, which keeps
  * sum(rank) = 1 an exact invariant (spec-asserted) instead of
  * letting sink nodes leak mass. Nothing here is a crossJoin, a
  * window over the node set, or a per-node driver loop.
  */
object PageRank {
  type Q = (SparkSession, String) => DataFrame

  /** Ranks after `iters` damped iterations over `edges(src, dst)`
    * (directed, duplicates collapse to one edge). Returns
    * (node, rank) for every node appearing as src or dst.
    */
  def pageRank(edges0: DataFrame, damping: Double = 0.85,
               iters: Int = 10, checkpointEvery: Int = 3): DataFrame = {
    val edges = edges0.toDF("src", "dst").distinct().localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank on an empty edge set")
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(outDeg, "src").localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contribs = withDeg
        .join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("contrib"))
      // rank parked on dangling nodes (no out-edges) this round —
      // kept IN-PLAN as a one-row broadcast (scalar expansion, the
      // q40/q41 pattern) rather than a driver collect, so an
      // iteration never blocks: only the periodic checkpoint runs a
      // job, materializing `checkpointEvery` iterations at once
      val dangling = ranks
        .join(outDeg, col("node") === col("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
      ranks = nodes.join(contribs, Seq("node"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("dm") / n)).as("rank"))
      if (i % checkpointEvery == 0 || i == iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** The customer→supplier fulfillment graph: an edge per distinct
    * (o_custkey, l_suppkey) pair reachable through an order. Ranks
    * concentrate on suppliers serving many well-connected customers
    * — "supplier centrality" telemetry over the same facts as the
    * relational suite.
    */
  def fulfillmentEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      // customers and suppliers share a key space only by accident —
      // offset suppliers into a disjoint id range
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000000L).as("dst"))

  /** Top-25 nodes by rank. rows-only: iterative damped sums aren't
    * ANSI-SQL-expressible (recursive CTEs forbid aggregation in the
    * recursive member); the spec asserts mass conservation, a
    * closed-form tiny-graph fixpoint, and driver-recompute equality.
    */
  val pr01_pagerank: Q = (s, d) =>
    pageRank(fulfillmentEdges(s, d))
      .select(col("node"), round(col("rank") * 1000000000) / 1000000000 as "rank_r")
      .orderBy(col("rank_r").desc, col("node")).limit(25)

  val registry: Map[String, Q] = Map("pr01_pagerank" -> pr01_pagerank)
  val oracles: Map[String, String] = Map.empty
}
