package graft.dedup

import graft.SparkSpecBase

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference answer: sequential union-find. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap.filter { case (k, r) => k != r }
  }

  test("chain component: converges in O(log n) rounds where propagation needs O(diameter)") {
    val chain = (0L until 100L).map(i => (i, i + 1))
    val (out, rounds) =
      ConnectedComponents.starsWithRounds(chain.toDF("id1", "id2"))
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (1L to 100L).map(_ -> 0L).toMap)
    // diameter 100; a propagation loop capped at 20 rounds returns
    // partial labels here — the star algorithm must stay logarithmic
    assert(rounds <= 12, s"expected O(log n) rounds, got $rounds")
  }

  test("random graph matches union-find ground truth") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(400)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    val got = ConnectedComponents.stars(edges.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges))
  }

  test("10x edges: round count stays bounded (log-round scaling)") {
    def grid(n: Int): Seq[(Long, Long)] =
      // n chain components of 20 nodes each — component count scales,
      // diameter fixed
      (0 until n).flatMap { c =>
        val base = c.toLong * 100
        (0L until 19L).map(i => (base + i, base + i + 1))
      }
    val (_, r1) = ConnectedComponents.starsWithRounds(grid(5).toDF("id1", "id2"))
    val (out10, r10) = ConnectedComponents.starsWithRounds(grid(50).toDF("id1", "id2"))
    assert(out10.count() == 50 * 19)
    assert(r10 <= r1 + 2, s"rounds grew with data size: $r1 -> $r10")
  }

  test("empty and single-edge inputs") {
    assert(ConnectedComponents.stars(Seq.empty[(Long, Long)].toDF("id1", "id2")).count() == 0)
    val one = ConnectedComponents.stars(Seq((7L, 3L)).toDF("id1", "id2")).collect()
    assert(one.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((7L, 3L)))
  }
}
