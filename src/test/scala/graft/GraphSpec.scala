package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Graph analytics: PageRank fixed-point arithmetic pinned against a
  * hand-rolled reference iteration, triangle enumeration against a known
  * topology (each triangle once, duplicates/reversed edges collapsed). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val edgeList = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))

  test("pageRank matches a hand-rolled fixed-point iteration") {
    val got = Graph.pageRank(edgeList.toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the same micro-unit recurrence, computed driver-side
    val deg = edgeList.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var exp = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
    for (_ <- 0 until 5) {
      val sums = edgeList.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) =>
          math.floor(exp(s).toDouble / deg(s)).toLong
        }.sum
      }
      exp = exp.keys.map(id => id ->
        math.floor(150000.0 + 0.85 * sums.getOrElse(id, 0L).toDouble + 0.5).toLong).toMap
    }
    assert(got == exp)
  }

  test("pageRank ranks the cycle members above the pass-through node") {
    // 1↔3 recirculate rank (3 returns everything to 1); 2 only ever
    // receives half of 1's rank and passes it on — structurally lowest
    val r = Graph.pageRank(edgeList.toDF("src", "dst"), 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(3L) > r(2L))
  }

  test("triangles enumerates each triangle exactly once, canonically ordered") {
    // triangle {1,2,3} with a reversed duplicate edge, triangle {4,5,6},
    // bridge 3-4 creating wedges but no extra triangle
    val edges = Seq((1L, 2L), (3L, 2L), (1L, 3L), (2L, 1L),
      (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val t = Graph.triangles(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t.length == t.distinct.length, "a triangle was emitted twice")
    assert(t.toSet == Set((1L, 2L, 3L), (4L, 5L, 6L)))
  }

  test("degree-oriented triangles equal the naive enumeration, including " +
    "on a hub-skewed graph") {
    // same fixture as the naive test
    val edges = Seq((1L, 2L), (3L, 2L), (1L, 3L), (2L, 1L),
      (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    def tset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tset(Graph.trianglesOriented(edges)) == tset(Graph.triangles(edges)))
    // hub-skewed: vertex 0 (lowest id, highest degree — the id-ordering
    // worst case) connects to everyone; spokes 1..20 form a ring, so
    // triangles are exactly {0, i, i+1} plus the fan closures
    val hub = ((1L to 20L).map(i => (0L, i)) ++
      (1L until 20L).map(i => (i, i + 1)) :+ (20L, 1L)).toDF("src", "dst")
    val naive = tset(Graph.triangles(hub))
    val oriented = tset(Graph.trianglesOriented(hub))
    assert(oriented == naive)
    assert(naive.nonEmpty)
  }

  test("labelPropagate finds the two components of a disconnected graph") {
    // component {1,2,3} (triangle) and {10,11} (single edge); 8 rounds far
    // exceeds both diameters, so labels are fully converged minima
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L)).toDF("src", "dst")
    val comp = Graph.labelPropagate(edges, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("labelPropagate pre-convergence is the exact k-round min-spread") {
    // path 1-2-3-4-5: after ONE round each node has min(self, neighbors)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val comp = Graph.labelPropagate(edges, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("bfsDist: hop distances from the min node; unreached stays null") {
    // path 1-2-3 plus isolated pair 8-9; source = min id = 1
    val edges = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val d = Graph.bfsDist(edges, 4).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 8L -> -1L, 9L -> -1L))
  }

  test("kCorePeel removes tails but keeps the 2-core cycle") {
    // triangle {1,2,3} with pendant chain 3-4-5: the chain peels off in
    // two rounds, the triangle survives with degree 2 everywhere
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = Graph.kCorePeel(edges, 2, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("graded trade-graph queries run on sf0.001 and agree on the edge set") {
    val pr = SparkEntry.queries("graph_pagerank")(spark, sf)
    assert(pr.count() > 0)
    // rank column is the micro-unit quotient: bounded by the teleport floor
    val prs = pr.select(col("pr")).collect().map(_.getDouble(0))
    assert(prs.forall(_ >= 0.15), "a rank fell below the teleport mass")
    val tri = SparkEntry.queries("graph_triangle_count")(spark, sf)
    // canonical ordering: every triple strictly increasing
    assert(tri.filter(!(col("na") < col("nb") && col("nb") < col("nc"))).count() == 0)
  }

  test("scc finds exact components on a hand-built two-cycle digraph") {
    // cycle {1,2,3}, cycle {4,5}, bridge 3->4 (one-way), isolate-ish 6->1:
    // SCCs are {1,2,3}, {4,5}, {6}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L),
      (3L, 4L), (6L, 1L)).toDF("src", "dst")
    val got = Graph.scc(edges, doublingRounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L))
  }

  test("graph_scc: scc_id is the minimum member nation key and sizes are " +
    "consistent with membership counts") {
    val rows = SparkEntry.queries("graph_scc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = rows.groupBy(_.getAs[Long]("scc_id"))
    byId.foreach { case (id, members) =>
      members.foreach(m => assert(m.getAs[Long]("scc_size") === members.length))
    }
    assert(byId.values.map(_.length).sum === rows.length)
  }

  test("allPairsDist matches hand-computed distances on a path-plus-isolate") {
    // path 1-2-3-4 (undirected via symmetrization) and the pair {7,8}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("src", "dst")
    val d = Graph.allPairsDist(edges, iters = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d((1L, 4L)) === 3L)
    assert(d((4L, 1L)) === 3L)
    assert(d((2L, 4L)) === 2L)
    assert(d((7L, 8L)) === 1L)
    // cross-component pairs never materialize
    assert(!d.contains((1L, 7L)) && !d.contains((8L, 3L)))
  }

  test("graph_closeness: scores live in [0,1] and isolates score exactly 0") {
    val rows = SparkEntry.queries("graph_closeness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("closeness")
      assert(c >= 0.0 && c <= 1.0 + 1e-9, s"closeness=$c")
      if (r.getAs[Long]("sum_dist") == 0L) assert(c === 0.0)
      // reachable counts include the source itself
      assert(r.getAs[Long]("n_reachable") >= 1L)
    }
  }

  test("graph_degree_powerlaw: the ranked degree curve slopes down over " +
    "a full 100-point fit") {
    val r = SparkEntry.queries("graph_degree_powerlaw")(spark, sf).head
    assert(r.getAs[Long]("n_points") == 100L)
    // ranked degrees can only fall; at the sf0.001 unit fixture the
    // top-100 are all ties (slope exactly 0), at sf0.01+ strictly down
    assert(r.getAs[Double]("degree_slope") <= 0.0)
    assert(r.getAs[Long]("n_edges") >= r.getAs[Long]("n_nodes"))
    assert(r.getAs[Long]("max_degree") >= 1L)
  }
}
