package graft

import graft.ext.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)],
                 maxIter: Int = 50): Map[Long, Long] =
    Graph.connectedComponents(
        nodes.toDF("doc_id"), "doc_id",
        edges.toDF("id_a", "id_b"), "id_a", "id_b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain, pair, and isolated node resolve to min-id components") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L, 6L),
      Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L))
  }

  test("empty edge set leaves every node its own component") {
    val got = cc(Seq(10L, 20L), Seq.empty)
    assert(got == Map(10L -> 10L, 20L -> 20L))
  }

  test("long chain converges (propagation spans the full diameter)") {
    val n = 12L
    val got = cc(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(1L))
  }

  test("edge direction is irrelevant (graph is symmetrized)") {
    val got = cc(Seq(1L, 2L, 3L), Seq((3L, 2L), (2L, 1L)))
    assert(got.values.toSet == Set(1L))
  }

  test("triangle plus bridge merges into one component") {
    // {1,2,3} triangle, {4,5} pair, bridge 3-4 merges everything
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (3L, 4L)))
    assert(got.values.toSet == Set(1L))
  }

  test("edge endpoints absent from nodes still relay labels") {
    // 9 exists only in the edge set: 1-9, 9-2 must still connect 1 and 2,
    // and 9 must NOT appear in the output (one row per input node)
    val got = cc(Seq(1L, 2L), Seq((1L, 9L), (9L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("insufficient maxIter fails loudly instead of returning wrong labels") {
    val nodes = (1L to 30L).toSeq
    val edges = (1L until 30L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      cc(nodes, edges, maxIter = 2)
    }
  }

  test("pointer jumping converges a 200-chain in O(log n) rounds") {
    // plain min-propagation would need 199 rounds; path halving must land
    // well under log2(200) + slack
    val n = 200L
    val got = cc(1L to n, (1L until n).map(i => (i, i + 1)), maxIter = 12)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 200)
  }

  test("reliable checkpointDir mode equals the localCheckpoint default") {
    // same chain + bridge graphs as above, run through durable
    // checkpoint()/round files instead of executor-memory blocks — the
    // 100 TB configuration must be label-for-label identical
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
      .toString
    val dirBefore = spark.sparkContext.getCheckpointDir
    def ccReliable(nodes: Seq[Long],
                   edges: Seq[(Long, Long)]): Map[Long, Long] =
      Graph.connectedComponents(
          nodes.toDF("doc_id"), "doc_id",
          edges.toDF("id_a", "id_b"), "id_a", "id_b",
          checkpointDir = Some(dir))
        .as[(Long, Long)].collect().toMap
    val chainNodes = (1L to 30L).toSeq
    val chainEdges = (1L until 30L).map(i => (i, i + 1))
    assert(ccReliable(chainNodes, chainEdges) == cc(chainNodes, chainEdges))
    val bridgeNodes = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val bridgeEdges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (3L, 5L))
    assert(ccReliable(bridgeNodes, bridgeEdges) == cc(bridgeNodes, bridgeEdges))
    // the reliable mode actually wrote round state to the directory
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, s"no checkpoint files written under $dir")
    // the SparkContext-global checkpoint dir was restored, not leaked
    assert(spark.sparkContext.getCheckpointDir == dirBefore,
      "connectedComponents leaked its checkpoint dir into the context")
    // superseded round files were deleted as rounds advanced: each call's
    // private UUID scratch dir retains only the edge frame and the final
    // round (the files backing the returned DataFrame), not one per round
    import scala.jdk.CollectionConverters._
    val uuidDirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq
    assert(uuidDirs.nonEmpty)
    uuidDirs.foreach { u =>
      val rdds = java.nio.file.Files.list(u).iterator().asScala
        .count(_.getFileName.toString.startsWith("rdd-"))
      assert(rdds <= 3,
        s"round checkpoints accumulated under $u: $rdds rdd dirs remain")
    }
  }
}
