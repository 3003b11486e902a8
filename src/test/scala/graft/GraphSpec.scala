package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference single-threaded replay of the operator's exact integer
    * recurrence, for arbitrary edge lists.
    */
  private def expected(edges: Seq[(Long, Long)], iters: Int, unit: Long = 1000000000000L): Map[Long, Long] = {
    val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = unit * 15L / 100L
    var rank = vs.map(_ -> unit).toMap
    for (_ <- 0 until iters) {
      val mass = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (u, _) => rank(u) * 85L / (100L * deg(u)) }.sum)
        .toMap
      rank = vs.map(v => v -> (teleport + mass.getOrElse(v, 0L))).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank: matches the integer recurrence exactly on a cyclic graph") {
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1 (cycle so mass keeps moving)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    assert(run(edges, 5) == expected(edges, 5))
  }

  test("pageRank: a sink vertex keeps only accumulating; its outbound mass is dropped") {
    val edges = Seq((1L, 2L)) // 2 is dangling
    val got = run(edges, 3)
    assert(got == expected(edges, 3))
    // vertex 1 has no in-edges: teleport only after iteration 1
    assert(got(1L) == 150000000000L)
    // vertex 2 receives 85% of 1's teleport-only rank
    assert(got(2L) == 150000000000L + 150000000000L * 85L / 100L)
  }

  test("pageRank: iters = 0 returns the uniform initial ranks") {
    val got = run(Seq((1L, 2L), (2L, 1L)), 0)
    assert(got == Map(1L -> 1000000000000L, 2L -> 1000000000000L))
  }

  test("pageRank: reliable checkpoint dir yields identical ranks to localCheckpoint") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pr-ckpt").toString
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 3, checkpointDir = Some(ckpt))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected(edges, 3), "reliable-checkpoint run must match the recurrence exactly")
    // the lineage cut really went through the reliable store
    val wrote = new java.io.File(ckpt).listFiles()
    assert(wrote != null && wrote.nonEmpty, "checkpoint dir must contain materialized RDD state")
  }

  test("pageRank: rejects degenerate damping") {
    assertThrows[IllegalArgumentException](
      Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 1, dampNum = 100, dampDen = 100))
  }

  test("triangleCounts: K4 gives 3 per vertex; dedup/self-loop/direction normalization; open wedge is no triangle") {
    // K4 on {1,2,3,4} with noise: duplicate edges, reversed direction,
    // a self-loop, and a pendant open wedge 4-5, 5-6 (no 4-6 edge)
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b) // both directions = dedup test
    val edges = (k4 ++ Seq((1L, 1L), (4L, 5L), (5L, 4L), (5L, 6L))).toDF("src", "dst")
    val out = Graph.triangleCounts(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // K4 has C(4,3)=4 triangles; each vertex sits in C(3,2)=3 of them
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $out")
    // a pure path has no triangles at all
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangleCounts(path, "src", "dst").count() == 0)
  }
}
