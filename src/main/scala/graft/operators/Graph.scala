package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics in DataFrame form (the connected-components
  * twin lives in [[Dedup.duplicateGroups]]). PageRank here is the
  * vertex-centric join-aggregate iteration: each round, ranks flow across
  * the edge relation (one shuffle on src), aggregate at the destination
  * (one shuffle on dst), and re-join the vertex set.
  *
  * Determinism: ranks are held as FIXED-POINT LONGS (units of 1e-12), and
  * every per-edge contribution is an integer floor-division
  * `(rank * dampNum) div (dampDen * out_degree)` — exact in any engine, so
  * distributed summation order cannot perturb a single unit and the DuckDB
  * oracle replays the iteration bit-for-bit. A floating-point PageRank
  * would hash-mismatch on association order alone.
  */
object Graph {

  /** PageRank over a directed edge list, `iters` synchronous iterations,
    * damping `dampNum/dampDen` (default 85/100). Vertices = src ∪ dst.
    * Dangling vertices (no out-edges) retain the teleport term only; their
    * outbound mass is dropped, the common simplified formulation — stated
    * here because the oracle must replay the same choice.
    *
    * rank_0(v)   = unit
    * rank_t+1(v) = (unit * (dampDen-dampNum)) div dampDen
    *             + Σ_{(u,v) ∈ E} (rank_t(u) * dampNum) div (dampDen * deg(u))
    *
    * Scale: each iteration is two shuffles of vertex/edge-grain relations
    * (contribution join on src, aggregate on dst) — the GraphX Pregel cost
    * without leaving DataFrame-land, so AQE and Tungsten still apply. The
    * rank lineage is cut every iteration, keeping the plan constant-size
    * across rounds; pass `checkpointDir` for RELIABLE checkpoints that
    * survive executor loss (the right choice for an hours-long cluster
    * run) instead of the default executor-memory `localCheckpoint` —
    * [[Dedup.duplicateGroups]]' contract.
    *
    * Long-range audit: Σ ranks ≤ |V|·unit; one rank ≤ |V|·unit in the
    * pathological star, so `rank * dampNum` stays under 2^63 for
    * |V|·unit·dampNum < 9.2e18 — at unit=1e12, |V| up to ~10^5 with the
    * default damping. Larger graphs lower `unit`.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      unit: Long = 1000000000000L,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(iters >= 0, "pageRank: iters must be >= 0")
    require(dampNum > 0 && dampDen > dampNum, "pageRank: need 0 < dampNum < dampDen")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
    // The edge relation is cut ONCE up front: every iteration replans from
    // this DataFrame, and without the cut Spark re-executes the whole
    // upstream edge derivation (for a co-occurrence graph, a fact-table
    // self-join + distinct) once per iteration — iters× the most expensive
    // scan in the query (q116 at sf0.1: 17.7 s without the cut, 4.1 s with).
    val e = cut(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val vertices = cut(e.select(col("src").as("vid")).union(e.select(col("dst"))).distinct())
    val outDeg = cut(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val teleport = (unit * (dampDen - dampNum)) / dampDen
    var ranks = vertices.select(col("vid"), lit(unit).as("rank_units"))
    for (_ <- 0 until iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("vid"))
        .join(outDeg, "src")
        .select(col("dst"), expr(s"(rank_units * ${dampNum}L) div (${dampDen}L * deg)").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("mass"))
      ranks = cut(vertices
        .join(contribs, vertices("vid") === contribs("dst"), "left")
        .select(col("vid"), (lit(teleport) + coalesce(col("mass"), lit(0L))).as("rank_units")))
    }
    ranks
  }

  /** PER-VERTEX TRIANGLE COUNTS over an undirected graph (community /
    * spam / link-farm structure signals) — the DEGREE-ORIENTED
    * edge-iterator algorithm: orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher one, build wedges by
    * joining oriented edges on their source, and close each wedge
    * against the oriented edge set. Orientation makes the wedge count
    * Σ d_oriented(u)² with d_oriented ≤ O(√m) on any graph — the
    * classical bound that keeps a power-law hub from exploding the
    * intermediate — while leaving the triangle set exactly the set of
    * closed triples (each found exactly once, at its lowest-ordered
    * vertex).
    *
    * Input edges may be directed/duplicated/self-looped; they normalize
    * to simple undirected edges first. Output: (vid, n_triangles) for
    * every vertex in at least one triangle.
    *
    * SCALE: three shuffles (degree agg, wedge join on u, closing join on
    * (v,w)) over edge-grain relations — no vertex ever needs its full
    * neighborhood in memory, so the operator survives graphs whose hubs
    * dwarf executor memory.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = graft.core.Caching.cached(
      edges
        .select(least(col(srcCol), col(dstCol)).cast("long").as("a"), greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
        .filter(col("a") =!= col("b") && col("a").isNotNull)
        .distinct()
    )
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    // orient lower (degree, id) -> higher; (d, id) is a total order
    val oriented = graft.core.Caching.cached(
      withDeg.select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("a")).otherwise(col("b")).as("u"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("b")).otherwise(col("a")).as("v")
      )
    )
    val e1 = oriented.select(col("u"), col("v"))
    val e2 = oriented.select(col("u"), col("v").as("w"))
    val wedges = e1.join(e2, Seq("u")).filter(col("v") < col("w"))
    // a wedge (u; v, w) closes iff the oriented edge between v and w
    // exists — orientation direction between them is unknown, so probe
    // the undirected set (u < v in `und` by construction)
    val tri = wedges.join(
      und.select(col("a").as("v"), col("b").as("w")),
      Seq("v", "w"),
      "left_semi"
    )
    tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("vid"))
      .groupBy(col("vid"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
