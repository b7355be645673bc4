package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list via alternating
  * large-star / small-star rounds (the two-phase MapReduce CC
  * algorithm of Kiveris et al., "Connected Components in MapReduce
  * and Beyond"). The streaming reference has no graph surface; this
  * backs dd06's near-dup clustering (the "pick one representative per
  * duplicate group" step of a dedup pipeline).
  *
  * Why not label propagation: propagation needs O(component diameter)
  * rounds, so one chain-shaped component turns the loop into a scale
  * killer (and a fixed round cap silently returns unconverged
  * labels). The star algorithm converges in O(log n) rounds on ANY
  * topology. Each round is two grouped aggregations — one shuffle on
  * the node id each — over the current edge set, which only shrinks.
  *
  * Scale hygiene per round: the new edge set is `localCheckpoint`ed
  * (eager), truncating lineage so planning cost stays constant per
  * round instead of growing; the previous round's blocks are released
  * when dereferenced. Convergence is detected from a single
  * aggregation over the checkpointed set (count + two independent
  * 64-bit hash sums), not a per-round join-and-diff.
  */
object ConnectedComponents {

  /** `pairs`: undirected edges as two numeric columns (any
    * orientation; self-loops dropped). Returns (node, root) for every
    * NON-root node, root = the component's minimum node id — i.e. the
    * final star forest. Throws if `maxRounds` is hit without
    * convergence instead of returning partial labels (at O(log n)
    * rounds, 50 covers any realizable graph).
    */
  def stars(pairs: DataFrame, maxRounds: Int = 50): DataFrame =
    starsWithRounds(pairs, maxRounds)._1

  def starsWithRounds(pairs: DataFrame, maxRounds: Int = 50): (DataFrame, Int) = {
    val Seq(c1, c2) = pairs.columns.toSeq.take(2).map(col)
    // canonical orientation: u > v, distinct
    var edges = pairs
      .select(greatest(c1, c2).as("u"), least(c1, c2).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var fp = fingerprint(edges)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // large-star: every node u computes m = min(N(u) ∪ {u}) over its
      // full (symmetrized) neighborhood; strictly larger neighbors
      // re-point to m. Output keeps the u > v orientation (m < u < x).
      val sym = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val large = sym.groupBy("u")
        .agg(collect_set("v").as("vs"))
        .select(col("u"), least(col("u"), array_min(col("vs"))).as("m"), col("vs"))
        .select(explode(expr("filter(vs, x -> x > u)")).as("bigger"), col("m"))
        .select(col("bigger").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: u's neighbors here are all smaller (orientation
      // invariant), so m = min(N(u)); every other small neighbor and u
      // itself re-point to m.
      val next = large.groupBy("u")
        .agg(collect_set("v").as("vs"))
        .select(col("u"), array_min(col("vs")).as("m"), col("vs"))
        .select(explode(concat(expr("filter(vs, x -> x != m)"), array(col("u")))).as("x"),
          col("m"))
        .select(col("x").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      edges = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds star rounds")
    (edges.select(col("u").as("node"), col("v").as("root")), rounds)
  }

  /** Order-insensitive edge-set fingerprint: row count plus two
    * independently-seeded hash XORs (the rows are distinct, so XOR
    * cancellation needs a 128-bit collision). Equal fingerprints
    * across consecutive rounds mean the star forest is stable — the
    * algorithm's fixed point.
    */
  private def fingerprint(edges: DataFrame): (Long, Long, Long) = {
    val r = edges
      .select(xxhash64(col("u"), col("v")).as("h1"),
        xxhash64(col("v"), col("u"), lit(7)).as("h2"))
      .agg(count(lit(1)), expr("bit_xor(h1)"), expr("bit_xor(h2)")).head()
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }
}
