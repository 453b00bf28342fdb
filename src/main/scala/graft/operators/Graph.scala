package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via the degree-ordered wedge join
  * (Suri & Vassilvitskii, "Counting triangles and the curse of the
  * last reducer", WWW'11; same family as Cohen's MapReduce graph
  * algorithms).
  *
  * Orient every undirected edge from its lower-(degree, id) endpoint
  * to its higher one; pair out-edges per source into wedges; close
  * each wedge with a semi-join against the oriented edge set. The
  * orientation bounds every out-degree at O(sqrt E), so the wedge
  * shuffle is O(E^1.5) worst case instead of sum-of-squared-degrees —
  * on a skewed 100 TB graph the difference between a bounded shuffle
  * and a hot-key explosion on the highest-degree vertex (the "last
  * reducer").
  *
  * Correctness subtlety (measured, not theoretical): the wedge pairing
  * must use the SAME (degree, id) total order as the orientation.
  * Pairing wedge endpoints by raw id silently drops every triangle
  * whose closing edge is oriented against id order — on the
  * co-purchase corpus that was HALF the triangles.
  */
object Graph {

  /** Partition count for the wedge fan-out stage, derived from the
    * measured wedge count rather than session conf. Never below the
    * session's base parallelism (local behavior unchanged at small
    * SFs); grows linearly with wedges above `basePart *
    * wedgesPerTask`; capped at 20,000 so a pathological degree
    * sequence can't ask the scheduler for millions of tasks. */
  private[graft] def wedgePartitions(nWedges: Long, basePart: Int,
      wedgesPerTask: Long): Int = {
    val perTask = math.max(1L, wedgesPerTask)
    val fromData = (nWedges + perTask - 1) / perTask
    math.max(basePart, math.min(20000L, fromData).toInt)
  }

  /** One-row triangle census of an undirected graph.
    *
    * @param edges distinct undirected edges as two long columns
    *              (`src`, `dst`), one row per edge with src != dst in
    *              either order; duplicates are removed defensively.
    * @return single row: n_nodes, n_edges, n_wedges (paths of length
    *         2 = sum over nodes of C(d,2)), n_triangles, clustering
    *         (global clustering coefficient 3T/W, NaN-free because
    *         W >= T). All counts exact integers; the final division
    *         is the only float op, so it is bit-deterministic.
    */
  def triangleStats(edges: DataFrame, src: String, dst: String): DataFrame = {
    val spark = edges.sparkSession
    // Byte-based bound below which the node-degree frame and the
    // closing edge set are broadcast to the wedge stream (the big
    // side: O(E^1.5) worst case — 41M rows from 1.2M edges on the
    // sf0.1 co-purchase graph). Estimated at ~24 B/row (2-3 longs +
    // row overhead) BEFORE the broadcast hash-map's own overhead; the
    // 64 MB default keeps the per-executor bet well under typical
    // executor headroom (the old 5M-ROW bound allowed ~120 MB maps —
    // an OOM there fails the whole census). Conf-overridable for
    // clusters with more memory.
    val broadcastMaxBytes =
      spark.conf.get("spark.graft.triangles.broadcastMaxBytes",
        (64L * 1024 * 1024).toString).toLong
    val broadcastMax = broadcastMaxBytes / 24L
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Every repartition below pins an explicit partition COUNT: under
    // size-targeted AQE coalescing (parallelismFirst=false) an
    // edge-sized shuffle (~30 MB at sf0.1) coalesces to ONE task, and
    // the O(E^1.5) wedge stage it feeds then runs single-threaded —
    // measured 15 s for a stage that takes ~2 s across 32 tasks. The
    // input sizes AQE sees are edge-sized; the work they feed is not.
    //
    // Both cached frames are edge-sized (never wedge-sized); without
    // them the edge-build pipeline re-executes for each of its
    // consumers (wedge left, wedge right, closing edge set, stats).
    val e = edges
      .select(least(col(src), col(dst)).as("p1"),
        greatest(col(src), col(dst)).as("p2"))
      .filter(col("p1") =!= col("p2"))
      .repartition(nPart, col("p1"), col("p2"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nEdges = e.count()
      val deg = e.select(col("p1").as("p"))
        .unionAll(e.select(col("p2").as("p")))
        .groupBy("p").agg(count(lit(1)).as("d"))
      val Array(nNodes, nWedges) = deg
        .agg(count(lit(1)), coalesce(
          sum(expr("d * (d - 1L) / 2")).cast("long"), lit(0L)))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
      def maybeBroadcast(df: DataFrame, rows: Long): DataFrame =
        if (rows <= broadcastMax) broadcast(df) else df
      val degB = maybeBroadcast(deg, nNodes)
      // The wedge stage's work is O(E^1.5) of its edge-sized INPUT, so
      // its partition count must come from the measured wedge count,
      // not session conf: at 100× the edges a conf-pinned 32 would run
      // a ~41-billion-row fan-out on 32 tasks. nWedges (sum C(d,2),
      // an upper bound on oriented wedges) is already exact here.
      val wedgePart = wedgePartitions(nWedges, nPart,
        spark.conf.get("spark.graft.triangles.wedgesPerTask", "4000000").toLong)
      // (deg, id) lexicographic order spelled as scalar predicates:
      // a struct(..) < struct(..) comparison materializes two structs
      // per probe row and falls out of whole-stage codegen — on the
      // 41M-row wedge stage that tripled its runtime (15 s -> 5 s
      // measured at sf0.1).
      val fwd = col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("p1") < col("p2"))
      val oriented = e
        .join(degB.select(col("p").as("p1"), col("d").as("d1")), "p1")
        .join(degB.select(col("p").as("p2"), col("d").as("d2")), "p2")
        .select(
          when(fwd, col("p1")).otherwise(col("p2")).as("u"),
          when(fwd, col("p2")).otherwise(col("p1")).as("v"),
          when(fwd, col("d2")).otherwise(col("d1")).as("dv"))
        .repartition(wedgePart, col("u"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // both wedge sides read the SAME cached u-partitioning, so the
        // self-join sorts locally with no further exchange
        val pairLt = col("a.dv") < col("b.dv") ||
          (col("a.dv") === col("b.dv") && col("a.v") < col("b.v"))
        val wedges = oriented.as("a").join(oriented.as("b"),
            col("a.u") === col("b.u") && pairLt)
          .select(col("a.v").as("x"), col("b.v").as("y"))
        val closed = wedges.join(
          maybeBroadcast(oriented.select(col("u").as("x"), col("v").as("y")),
            nEdges),
          Seq("x", "y"), "left_semi")
        val nTriangles = closed.count()
        // The census is ONE row, assembled on the driver from the
        // exact scalars — eager, so the cached edge frames release
        // here deterministically instead of leaking past the lazy
        // plan.
        import spark.implicits._
        val clustering = if (nWedges == 0L) 0.0
          else BigDecimal(3.0 * nTriangles / nWedges)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Seq((nNodes, nEdges, nWedges, nTriangles, clustering))
          .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles", "clustering")
      } finally {
        oriented.unpersist()
      }
    } finally {
      e.unpersist()
    }
  }
}
