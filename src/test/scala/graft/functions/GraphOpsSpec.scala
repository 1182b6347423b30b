package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** GraphOps.pageRankScaled — deterministic integer-scaled PageRank.
  * Pins the properties that make the t55 oracle row possible: exact
  * long arithmetic (bit-identical reruns), the mass invariant that
  * proves overflow-freedom at any graph size, damping behavior on
  * hubs vs dangling nodes, and agreement with a driver-side reference
  * implementation of the same update rule on a small random graph.
  */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val S = 1000000L

  private def ranksOf(edges: Seq[(String, String, Long)],
      iters: Int = 5): Map[String, Long] =
    GraphOps.pageRankScaled(
        edges.toDF("src", "dst", "cnt"), iters)
      .as[(String, Long)].collect().toMap

  /** The same update rule, driver-side: the spec's independent oracle. */
  private def reference(edges: Seq[(String, String, Long)],
      iters: Int): Map[String, Long] = {
    val outW = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val q = outW.map { case (u, w) => u -> (r(u) * 85L) / (w * 100L) }
      val c = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.collect { case (u, _, cnt) if q.contains(u) => q(u) * cnt }.sum
      }
      r = nodes.map(v => v -> (150000L + c.getOrElse(v, 0L))).toMap
    }
    r
  }

  private val chain = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))

  test("matches the driver-side reference rule exactly (random graph)") {
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 20).map(i => s"n$i")
    val edges = (0 until 80).map { _ =>
      (nodes(rnd.nextInt(20)), nodes(rnd.nextInt(20)), (rnd.nextInt(5) + 1).toLong)
    }.distinct.filter(e => e._1 != e._2)
    assert(ranksOf(edges) == reference(edges, 5))
  }

  test("deterministic: identical longs on rerun") {
    assert(ranksOf(chain) == ranksOf(chain))
  }

  test("mass invariant: total rank never exceeds V * scale") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 60).map { _ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}", (rnd.nextInt(9) + 1).toLong)
    }.distinct.filter(e => e._1 != e._2)
    val r = ranksOf(edges, iters = 8)
    assert(r.values.sum <= r.size * S,
      s"mass ${r.values.sum} > ${r.size} * $S — the overflow-safety invariant")
    assert(r.values.forall(_ >= 150000L), "every node keeps the damped base")
  }

  test("a hub every node points to outranks its spokes; dangling nodes keep base rank") {
    // spokes -> hub; hub dangles (no outgoing edge)
    val star = (1 to 6).map(i => (s"s$i", "hub", 1L))
    val r = ranksOf(star)
    assert(r("hub") > r("s1"), s"hub=${r("hub")} spoke=${r("s1")}")
    // spokes receive nothing: exactly the damped base every iteration
    assert((1 to 6).forall(i => r(s"s$i") == 150000L))
    // hub receives the full damped quotient of 6 spokes after iter 1:
    // spokes stabilize at base, so hub = base + 6 * (base*85 div 100)
    assert(r("hub") == 150000L + 6L * (150000L * 85L / 100L))
  }
}
