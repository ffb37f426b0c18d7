package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over edge-list DataFrames (beyond SURVEY §2 core —
  * the iterative-BSP family next to [[Dedup.connectedComponents]]).
  *
  * Scale design (100 TB): an edge list is just a two-column table, so every
  * step here is a shuffle-on-key join/aggregate — the exact plan GraphX
  * lowers to, with no extra dependency and full Catalyst/AQE participation.
  * PageRank is one join + one aggregate per BSP round with the rank state
  * localCheckpointed (same seam as the CC loop: cut the iterative lineage,
  * re-plan each round at runtime). Triangle enumeration is the classic
  * two-join canonical-ordering form; at web scale the standard refinement
  * is degree-orientation (orient each edge toward the higher-degree vertex,
  * bounding per-vertex fanout by arboricity) — a pre-ranking step on the
  * same plan shape, not a different algorithm.
  */
object Graph {

  /** Fixed-iteration PageRank in integer micro-units.
    *
    * Cross-engine determinism (SURVEY §5.4 P2): ranks are BIGINT millionths.
    * Per-edge contribution `floor(rank / outdeg)` and the per-round update
    * `floor(0.15e6 + 0.85·Σ + 0.5)` are per-row IEEE double ops on integer
    * inputs — bit-identical in Spark and DuckDB — and the only aggregation
    * is an integer SUM, which no ordering can perturb. The result is an
    * exactly-reproducible rank vector (documented micro-unit quantization;
    * the usual float PageRank differs run-to-run at the ulp level anyway).
    *
    * Dangling vertices (no out-edges) keep the teleport mass only — the
    * simple variant; redistribution is one extra broadcast scalar per round
    * if ever needed. Returns (id, r) with r in micro-units.
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val fwd = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // (src, dst, outdeg) is consumed once per round under the same join key
    // — persist the joined form so rounds pay a cached scan, not the
    // upstream edge derivation (often a multiway join) each time
    val deg = fwd.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = fwd.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = fwd.select(col("src").as("id"))
      .union(fwd.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("id"), lit(1000000L).as("r")).localCheckpoint()
    for (_ <- 0 until iters) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"),
          // exact-rational floor survives the double division: |r| < 2^53
          // and the true quotient is ≥ 1/outdeg away from any integer it
          // doesn't equal, far beyond one ulp at these magnitudes
          floor(col("r").cast("double") / col("outdeg")).cast("long").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          floor(lit(150000.0) + lit(0.85) * coalesce(col("s"), lit(0L)).cast("double")
            + lit(0.5)).cast("long").as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** Every triangle in the undirected graph, emitted once as an ordered
    * (a < b < c) triple. Canonical-ordering enumeration: orient each edge
    * low→high, then a triangle is exactly one (a,b)-(b,c) wedge closed by
    * (a,c) — two equi-joins, no post-dedup. */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("na"), col("e1.b").as("nb"), col("e2.b").as("nc"))
  }
}
