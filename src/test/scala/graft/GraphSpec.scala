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

  /** Independent plain-Scala fold of the exact micro-unit PageRank
    * recurrence. */
  private def refPageRank(n: Int, edges: Seq[(Long, Long)],
                          iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val base = 150000L / n
    var pr = (0L until n.toLong).map(_ -> 1000000L / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => (85L * pr(u)) / (100L * out(u)) }.sum
      }
      pr = (0L until n.toLong).map(v => v -> (base + in.getOrElse(v, 0L)))
        .toMap
    }
    pr
  }

  test("pageRankMicro: cycle is a fixpoint, star concentrates on the " +
    "hub, sinks hold the base, all exactly equal to the reference fold") {
    import spark.implicits._
    def run(n: Int, es: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
      Graph.pageRankMicro(
          (0L until n.toLong).toDF("doc_id"), es.toDF("src", "dst"),
          "doc_id", "src", "dst", nNodes = n, iters = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3-cycle: uniform mass is a fixpoint of the integer recurrence
    val cyc = run(3, Seq((0L, 1L), (1L, 2L), (2L, 0L)), iters = 5)
    assert(cyc == Map(0L -> 333333L, 1L -> 333333L, 2L -> 333333L), cyc)
    // star 1→0, 2→0: hub out-ranks leaves; leaves (no in-links) hold
    // exactly the base term; everything matches the reference fold
    val starEdges = Seq((1L, 0L), (2L, 0L))
    val star = run(3, starEdges, iters = 4)
    assert(star == refPageRank(3, starEdges, 4), star)
    assert(star(0L) > star(1L) && star(1L) == star(2L))
    assert(star(1L) == 150000L / 3)
    // floors only ever LOSE mass: total stays under 1e6
    assert(star.values.sum <= 1000000L)
  }

  test("pageRankMicro unit scaling: underflow fails loudly, nano keeps " +
    "the cycle fixpoint at its own precision") {
    import spark.implicits._
    // micro past ~1e6 nodes: the base term would floor to zero and the
    // whole vector silently collapses — the require catches it up front
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankMicro((0L until 3L).toDF("doc_id"),
        Seq((0L, 1L)).toDF("src", "dst"), "doc_id", "src", "dst",
        nNodes = 2000000L, iters = 1)
    }
    assert(ex.getMessage.contains("underflows"))
    // the subtle regime: nNodes in (0.15·unit, unit] — unit/n is still
    // positive but the teleport base (15%·unit)/n floors to 0, which a
    // unit/n guard would miss and silently run base-0 PageRank
    val ex2 = intercept[IllegalArgumentException] {
      Graph.pageRankMicro((0L until 3L).toDF("doc_id"),
        Seq((0L, 1L)).toDF("src", "dst"), "doc_id", "src", "dst",
        nNodes = 200000L, iters = 1)
    }
    assert(ex2.getMessage.contains("underflows"))
    // same 3-cycle, nano units: uniform mass is the fixpoint at 1e9/3
    val cyc = Graph.pageRankMicro((0L until 3L).toDF("doc_id"),
        Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst"),
        "doc_id", "src", "dst", nNodes = 3, iters = 5,
        unit = 1000000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cyc.values.toSet == Set(333333333L), cyc)
  }

  test("persisted PageRank artifact: the stored probe is bit-identical " +
    "to the retrain, meta pins provenance by name, fsck is green, and " +
    "a tampered/truncated table trips mass conservation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val loc = java.nio.file.Files.createTempDirectory("graft_pr").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_prdb LOCATION '$loc'")
    val nodes = (0L until 6L).toDF("host_id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (3L, 4L), (4L, 5L),
      (5L, 3L)).toDF("src", "dst")
    val trained = Graph.pageRankMicro(nodes, edges, "host_id",
      "src", "dst", nNodes = 6, iters = 10)
    Graph.writePageRank(trained, "host_id", "graft_prdb.hostpr",
      iters = 10, nNodes = 6, nBuckets = 2)
    // probe ≡ retrain, bit for bit (pr_micro is exact long arithmetic)
    val stored = Graph.loadPageRank(spark, "graft_prdb.hostpr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = trained.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stored == want && stored.size == 6)
    assert(Graph.pageRankIdCol(spark, "graft_prdb.hostpr") == "host_id")
    val clean = graft.ext.IndexAudit.auditPageRank(spark,
      "graft_prdb.hostpr")
    assert(clean.filter(!col("ok")).count() == 0)
    // tamper: duplicate one host's row — node_count, uniqueness AND
    // the conserved mass all trip
    spark.table("graft_prdb.hostpr").filter(col("host_id") === 0L)
      .write.mode("append").insertInto("graft_prdb.hostpr")
    val bad = graft.ext.IndexAudit.auditPageRank(spark,
        "graft_prdb.hostpr")
      .filter(!col("ok")).collect().map(_.getString(0)).toSet
    assert(bad == Set("node_count", "ids_unique", "mass_conserved"), bad)
  }

  test("persisted components artifact: the stored probe is identical " +
    "to the retrain, fsck is green, and a raised / dangling / " +
    "duplicated label trips the right checks") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val loc = java.nio.file.Files.createTempDirectory("graft_cc").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ccdb LOCATION '$loc'")
    val nodes = Seq("a", "b", "c", "d", "e").toDF("host")
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("src", "dst")
    val trained = Graph.connectedComponents(nodes, "host", edges,
      "src", "dst")
    Graph.writeComponents(trained, "id", "graft_ccdb.comp", nBuckets = 2)
    val stored = Graph.loadComponents(spark, "graft_ccdb.comp")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(stored == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d"))
    def bad(): Set[String] = graft.ext.IndexAudit
      .auditComponents(spark, "graft_ccdb.comp")
      .filter(!col("ok")).collect().map(_.getString(0)).toSet
    assert(bad().isEmpty)
    // drift: the stored labeling covers its trained universe; a newly
    // discovered mirror host trips coverage (the retrain trigger)
    assert(graft.ext.IndexAudit.driftComponents(spark,
        "graft_ccdb.comp", nodes, "host")
      .filter(!col("ok")).count() == 0)
    val grown = nodes.union(Seq("zz").toDF("host"))
    assert(graft.ext.IndexAudit.driftComponents(spark,
        "graft_ccdb.comp", grown, "host")
      .filter(!col("ok")).count() == 1)
    // a RAISED label (min-propagation never raises) + a dangling
    // label (no such root) + a duplicated id, appended as corruption
    Seq(("c", "z")).toDF("id", "component")
      .write.mode("append").insertInto("graft_ccdb.comp")
    spark.catalog.refreshTable("graft_ccdb.comp")
    assert(bad() == Set("node_count", "ids_unique", "component_count",
      "labels_are_roots"), bad())
  }

  test("components lifecycle: drift trips on a newly discovered " +
    "mirror member, rebuildComponents retrains into the same layout, " +
    "fsck is clean, and the stored probe matches the retrain " +
    "bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val loc = java.nio.file.Files.createTempDirectory("graft_ccr").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ccrdb LOCATION '$loc'")
    val t = "graft_ccrdb.comp"
    val edges1 = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("src", "dst")
    val nodes1 = edges1.select(col("src").as("host"))
      .union(edges1.select(col("dst").as("host"))).distinct()
    Graph.writeComponents(
      Graph.connectedComponents(nodes1, "host", edges1, "src", "dst"),
      "id", t, nBuckets = 2)
    // cycle 2 discovers a new mirror member f bridging into {d, e}
    val edges2 = edges1.union(Seq(("e", "f")).toDF("src", "dst"))
    val nodes2 = edges2.select(col("src").as("host"))
      .union(edges2.select(col("dst").as("host"))).distinct()
    val drift = graft.ext.IndexAudit.driftComponents(spark, t,
      nodes2, "host").filter(!col("ok")).collect()
    assert(drift.length == 1 && drift.head.getLong(2) == 1L,
      drift.toSeq) // f uncovered — the retrain trigger
    // the stale probe would read f "not mirrored" — rebuild
    Graph.rebuildComponents(spark, t, nodes2, "host", edges2,
      "src", "dst")
    assert(graft.ext.IndexAudit.driftComponents(spark, t, nodes2,
      "host").filter(!col("ok")).count() == 0)
    assert(graft.ext.IndexAudit.auditComponents(spark, t)
      .filter(!col("ok")).count() == 0)
    // probe-parity: stored labels ≡ a fresh retrain over the universe
    val stored = Graph.loadComponents(spark, t)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fresh = Graph.connectedComponents(nodes2, "host", edges2,
        "src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(stored == fresh)
    assert(stored.contains(("f", "d"))) // the member's label exists now
    // layout preserved: the rebuild kept the table's own bucket count
    assert(spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t))
      .bucketSpec.exists(_.numBuckets == 2))
  }

  test("PageRank drift: the stored artifact covers its trained host " +
    "universe; a newly discovered host trips the coverage check (the " +
    "retrain trigger)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val loc = java.nio.file.Files.createTempDirectory("graft_prd").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_prddb LOCATION '$loc'")
    val nodes = (0L until 4L).toDF("host_id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("src", "dst")
    Graph.writePageRank(
      Graph.pageRankMicro(nodes, edges, "host_id", "src", "dst",
        nNodes = 4, iters = 5),
      "host_id", "graft_prddb.pr", iters = 5, nNodes = 4, nBuckets = 2)
    val clean = graft.ext.IndexAudit.driftPageRank(spark,
      "graft_prddb.pr", nodes, "host_id")
    assert(clean.filter(!col("ok")).count() == 0)
    val grown = nodes.union(Seq(9L, 10L).toDF("host_id"))
    val drifted = graft.ext.IndexAudit.driftPageRank(spark,
        "graft_prddb.pr", grown, "host_id")
      .filter(!col("ok")).collect()
    assert(drifted.length == 1 &&
      drifted.head.getString(0) == "hosts_covered" &&
      drifted.head.getLong(2) == 2L, drifted.toSeq)
  }

  test("PageRank lifecycle: drift trips on a newly discovered host, " +
    "rebuildPageRank retrains under the TRAINED iters/unit into the " +
    "same layout, fsck is clean, and the stored probe matches the " +
    "retrain bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val loc = java.nio.file.Files.createTempDirectory("graft_prr").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_prrdb LOCATION '$loc'")
    val t = "graft_prrdb.pr"
    val edges1 = Seq(("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val nodes1 = edges1.select(col("src").as("host"))
      .union(edges1.select(col("dst").as("host"))).distinct()
    Graph.writePageRank(
      Graph.pageRankMicro(nodes1, edges1, "host", "src", "dst",
        nNodes = 3, iters = 5),
      "host", t, iters = 5, nNodes = 3, nBuckets = 2)
    // cycle 2 discovers every source linking to one new hub
    val edges2 = edges1.union(
      Seq(("a", "hub"), ("b", "hub"), ("c", "hub")).toDF("src", "dst"))
    val nodes2 = edges2.select(col("src").as("host"))
      .union(edges2.select(col("dst").as("host"))).distinct()
    val drift = graft.ext.IndexAudit.driftPageRank(spark, t,
      nodes2, "host").filter(!col("ok")).collect()
    assert(drift.length == 1 && drift.head.getLong(2) == 1L,
      drift.toSeq) // hub uncovered — the retrain trigger
    // the stale probe would schedule hub at authority 0 — rebuild
    Graph.rebuildPageRank(spark, t, nodes2, "host", edges2,
      "src", "dst")
    assert(graft.ext.IndexAudit.driftPageRank(spark, t, nodes2,
      "host").filter(!col("ok")).count() == 0)
    assert(graft.ext.IndexAudit.auditPageRank(spark, t)
      .filter(!col("ok")).count() == 0)
    // probe-parity: stored ranks ≡ a fresh retrain over the union
    // universe under the SAME trained hyper-parameters (iters = 5 —
    // the rebuild must read them from meta, not default to 10)
    val stored = Graph.loadPageRank(spark, t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val fresh = Graph.pageRankMicro(
        nodes2, edges2, "host", "src", "dst", nNodes = 4, iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(stored == fresh)
    val hub = stored.toMap.apply("hub")
    assert(hub > 0L) // covered now, with propagated in-link mass
    // layout preserved: bucket count and recorded id column survive
    assert(spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t))
      .bucketSpec.exists(_.numBuckets == 2))
    assert(Graph.pageRankIdCol(spark, t) == "host")
    // meta's conserved mass tracks the REBUILT training (a stale
    // sum would trip mass_conserved on the next fsck — checked above)
  }

  test("persisted host-link relation: appendHostLinks lands only NEW " +
    "pairs (the store stays the union's distinct — duplicates and " +
    "self-loops add nothing) and matches writeHostLinks over the " +
    "unioned universe bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val loc = java.nio.file.Files.createTempDirectory("graft_hl").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_hldb LOCATION '$loc'")
    val t = "graft_hldb.links"
    val t2 = "graft_hldb.links_oneshot"
    val e1 = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val e2 = Seq(("a", "b"), ("a", "a"), ("c", "d"), ("c", "d"))
      .toDF("src", "dst")
    Graph.writeHostLinks(e1, "src", "dst", t, nBuckets = 2)
    Graph.appendHostLinks(e2, "src", "dst", t)
    Graph.writeHostLinks(e1.union(e2), "src", "dst", t2, nBuckets = 2)
    def rows(table: String): Set[(String, String)] =
      spark.table(table).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows(t) == rows(t2))
    assert(rows(t) == Set(("a", "b"), ("b", "c"), ("c", "d")))
    // a replayed batch is a no-op (the retried-cycle contract)
    Graph.appendHostLinks(e2, "src", "dst", t)
    assert(spark.table(t).count() == 3L)
  }
}
