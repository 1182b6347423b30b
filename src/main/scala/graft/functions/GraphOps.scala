package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists.
  *
  * The scale shape shared by every op here: the corpus-sized pass
  * happens ONCE (building the edge list); the iterations then run at
  * GRAPH cardinality (vocabulary, entities, cluster reps — bounded and
  * usually orders of magnitude below corpus rows), each iteration one
  * join + one aggregation shuffle on the edge list, with
  * `localCheckpoint` truncating the logical plan per round (a plan that
  * references the previous round's frame grows exponentially and OOMs
  * the driver near round 20 — the connectedComponents lesson,
  * Dedup.scala).
  */
object GraphOps {

  /** Weighted directed PageRank in deterministic integer-scaled
    * arithmetic — bit-identical on any engine, so the ranks themselves
    * can be oracle-hash-checked (floating-point PageRank never hashes
    * across engines: contribution sums stream in partition order).
    *
    * `edges` must have columns (src, dst, cnt). Update rule, all long
    * math:
    *
    *   q(u)  = (R(u)·dampNum) div (outW(u)·dampDen)     per-node quotient
    *   R'(v) = scale·(dampDen−dampNum) div dampDen + Σ_u q(u)·cnt(u,v)
    *
    * Dangling nodes (no outgoing edge) contribute nothing — the
    * standard leaked-mass variant, deterministic and division-free.
    *
    * Overflow safety BY INVARIANT, not hope (the t28 lesson): total
    * mass Σ R never exceeds V·scale (each iteration redistributes at
    * most the damped mass and adds V·base), so with V up to 1e9 nodes
    * at the default scale every intermediate — R·dampNum (≤ mass·85),
    * outW·dampDen (≤ total edge weight·100), q·cnt (≤ R), and every
    * sum (≤ mass) — stays far below Long.Max. No decimal needed.
    *
    * Both `div`s are integral division on positives (Spark `div` ==
    * DuckDB `//` there), so an oracle can replay the exact longs.
    */
  def pageRankScaled(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000L, dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum)
    val e = edges.select(col("src"), col("dst"), col("cnt")).persist()
    val outW = e.groupBy(col("src")).agg(sum(col("cnt")).as("out_w")).persist()
    val nodes = e.select(col("src").as("token"))
      .union(e.select(col("dst").as("token"))).distinct().persist()
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      val q = ranks.join(outW, ranks("token") === outW("src"))
        .select(col("src"),
          expr(s"(r * $dampNum) div (out_w * $dampDen)").as("q"))
      val contrib = e.join(q, "src")
        .groupBy(col("dst").as("token"))
        .agg(sum(col("q") * col("cnt")).as("c"))
      ranks = nodes.join(contrib, Seq("token"), "left")
        .select(col("token"),
          (lit(base) + coalesce(col("c"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    e.unpersist(); outW.unpersist(); nodes.unpersist()
    ranks.select(col("token"), col("r").as("pr"))
  }
}
