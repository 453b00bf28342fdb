package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val row = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .collect().head
    (row.getAs[Long]("n_nodes"), row.getAs[Long]("n_edges"),
      row.getAs[Long]("n_wedges"), row.getAs[Long]("n_triangles"))
  }

  test("single triangle") {
    assert(stats(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === ((3L, 3L, 3L, 1L)))
  }

  test("4-clique has C(4,3)=4 triangles and C(4,2)=6 edges") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    // each node has degree 3 -> 4 * C(3,2) = 12 wedges
    assert(stats(k4) === ((4L, 6L, 12L, 4L)))
  }

  test("path graph has wedges but no triangles") {
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === ((4L, 3L, 2L, 0L)))
  }

  test("star graph: hub wedges, zero triangles (the last-reducer shape)") {
    val star = (2L to 9L).map(i => (1L, i))
    assert(stats(star) === ((9L, 8L, 28L, 0L)))
  }

  test("normalizes duplicate / reversed / self-loop edges") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 1L), (2L, 2L))
    assert(stats(messy) === ((3L, 3L, 3L, 1L)))
  }

  test("wedge-stage partition count scales with measured wedge count") {
    // below base parallelism: local behavior unchanged
    assert(Graph.wedgePartitions(41_000_000L, 32, 4_000_000L) === 32)
    // 100× the sf0.1 wedge volume: partitions grow with the data,
    // not the session conf
    assert(Graph.wedgePartitions(4_100_000_000L, 32, 4_000_000L) === 1025)
    // pathological degree sequence: bounded task count
    assert(Graph.wedgePartitions(Long.MaxValue / 2, 32, 4_000_000L) === 20000)
    // zero-wedge graph still gets base parallelism
    assert(Graph.wedgePartitions(0L, 32, 4_000_000L) === 32)
  }

  test("triangle whose closing edge runs against raw-id order is counted") {
    // Degrees: 1:2, 2:4, 3:2, 4:1, 5:1. Orientation by (deg, id):
    // 1->2, 1->3, 3->2 (node 2 is the hub, so its edges point INTO
    // it). The wedge at source 1 must pair its endpoints as (3, 2) —
    // (deg, id) order — to find the closing edge 3->2; pairing by raw
    // id would look up 2->3, which doesn't exist, and drop the
    // triangle.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (2L, 5L))
    val (_, _, _, tris) = stats(g)
    assert(tris === 1L)
  }
}
