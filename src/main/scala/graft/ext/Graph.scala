package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph connectivity — the missing last stage of
  * every near-duplicate pipeline: pair detection (MinHash/Jaccard/cosine)
  * emits EDGES, but the drop decision needs CLUSTERS (keep one document
  * per connected component, not per pair — A~B and B~C must collapse to
  * one survivor even when A~C was never emitted as a pair).
  */
object Graph {

  /** Connected components by iterative minimum-label propagation WITH
    * pointer jumping: every node starts labeled with its own id; each
    * round, every node lowers its label to the minimum among itself and
    * its neighbors, then jumps to its label's label (path halving). At
    * fixpoint, each component is labeled with its smallest member id.
    *
    * Scale shape: one round = one equi-join (messages along edges) + one
    * partial-combinable `min` aggregation + one self-join (the jump) —
    * all shuffling on the node id, all AQE-skew-safe. `localCheckpoint`
    * after every round cuts the lineage (an iterative plan otherwise
    * grows by joins per round until the optimizer dominates wall-clock).
    * Plain propagation needs diameter rounds — fine for dup clusters
    * (dense, tiny diameters), fatal for chain-shaped graphs; the jump
    * halves remaining path length every round, so convergence is
    * O(log diameter) (same bound as large-star/small-star, one fewer
    * distinct primitive — spec-pinned: a 200-chain converges in ≤12
    * rounds). The per-round `isEmpty` convergence probe is a driver
    * ACTION on a 1-row-bounded plan — the standard iterative pattern
    * (GraphX Pregel does the same), not a collect of data.
    *
    * Returns one row per node: (id, component) with
    * `component = min(node id in component)`.
    *
    * Checkpoint placement: `checkpointDir = None` (the default) uses
    * eager `localCheckpoint` — executor-memory-backed, zero I/O, the
    * right call when label and edge frames fit in storage memory. At
    * 100 TB they don't, and a lost executor would take its lineage-free
    * blocks with it — pass `Some(dir)` (HDFS/S3 in production) to switch
    * every round to RELIABLE `checkpoint()`: plans stay equally flat,
    * state lives on durable storage, recovery re-reads instead of
    * recomputing-from-nothing. The SparkContext's global checkpoint dir
    * is restored on exit (set-and-restore, not leaked to other users of
    * the context), and each round's files are deleted as soon as the
    * next round no longer references them — only the edge frame, the
    * final round, and anything a concurrent user wrote survive the call.
    * The final round's files back the RETURNED DataFrame: consume it,
    * then clean the scratch path (or run with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`).
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame =
    connectedComponentsWithRounds(nodes, idCol, edges, srcCol, dstCol,
      maxIter, checkpointDir)._1

  /** [[connectedComponents]] plus the number of propagation rounds it
    * took to converge — the scale-soak observable (rounds ≈
    * log2(diameter) with pointer jumping; a regression here means the
    * jump stopped engaging).
    */
  def connectedComponentsWithRounds(nodes: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50,
                          checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    val sc = nodes.sparkSession.sparkContext
    val reliable = checkpointDir.isDefined
    // set-and-restore: setCheckpointDir mutates SparkContext-global state,
    // so remember what was there and put it back on exit. (Restoring a
    // previously-set dir re-resolves a fresh UUID subdir under the old
    // resolved path — still inside the application's original location.)
    val prevDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    // setCheckpointDir resolves a fresh UUID subdir, so the resolved dir
    // is exclusively this call's — safe to diff-and-delete inside it
    def listCk(): Set[String] =
      if (!reliable) Set.empty
      else sc.getCheckpointDir.map { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(sc.hadoopConfiguration)
        if (fs.exists(p)) fs.listStatus(p).map(_.getPath.toString).toSet
        else Set.empty[String]
      }.getOrElse(Set.empty)
    def deleteCk(paths: Set[String]): Unit = paths.foreach { s =>
      val p = new org.apache.hadoop.fs.Path(s)
      try p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
      catch { case _: java.io.IOException => () } // cleanup is best-effort
    }
    try {
      val persistRound: DataFrame => DataFrame =
        if (reliable) df => df.checkpoint(eager = true)
        else df => df.localCheckpoint(eager = true)
      val sym = persistRound( // edges re-scan every round: pay the scan once
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))))
      val given = nodes.select(col(idCol).as("id"))
      // propagate over nodes ∪ edge endpoints: an endpoint missing from
      // `nodes` must still RELAY labels (and be visible to the convergence
      // probe — a label parked on an unknown id would otherwise look
      // converged one round early, silently splitting its component)
      val universe = given.union(sym.select(col("src").as("id"))).distinct()
      val preInit = listCk() // sym's files: referenced every round
      var labels = persistRound(
        universe.select(col("id"), col("id").as("component")))
      // files backing the PREVIOUS round's labels — deletable once the
      // round after next stops reading them (see the loop's tail)
      var prevRoundFiles = listCk() -- preInit
      var round = 0
      var converged = false
      while (!converged && round < maxIter) {
        val preRound = listCk()
        val msgs = sym.join(labels, sym("src") === labels("id"))
          .select(sym("dst").as("id"), labels("component"))
        // checkpointed BEFORE the self-join below: materializes one round's
        // labels once (instead of twice through the jump's two branches)
        // and keeps the lineage flat
        val lowered = persistRound(labels.union(msgs)
          .groupBy("id").agg(min("component").as("component")))
        val thisRoundFiles = listCk() -- preRound
        // pointer jump: component labels are themselves node ids in the
        // universe, so every label resolves; component(component) is
        // monotonically ≤ component, and following it halves the distance
        // to the component minimum each round
        val next = lowered
          .join(lowered.select(col("id").as("__cid"),
              col("component").as("__jump")),
            col("component") === col("__cid"))
          .select(col("id"), col("__jump").as("component"))
        // labels only ever decrease, so "any label still above the previous
        // round's value is impossible; any BELOW means not yet converged"
        converged = next.as("n")
          .join(labels.as("o"), col("n.id") === col("o.id"))
          .filter(col("n.component") < col("o.component"))
          .isEmpty
        labels = next
        round += 1
        // that probe was the LAST job reading the previous round's labels
        // (this round's `lowered` and the new `labels` derive only from
        // `lowered`'s fresh checkpoint) — its files are superseded now
        deleteCk(prevRoundFiles)
        prevRoundFiles = thisRoundFiles
      }
      require(converged,
        s"connectedComponents did not converge within $maxIter rounds " +
          "(component diameter exceeds maxIter — raise it, or switch this " +
          "graph to the large-star/small-star variant)")
      // the contract is one row per INPUT node; relay-only endpoints drop
      (labels.join(given, "id"), round)
    } finally {
      if (reliable) sc.setCheckpointDir(prevDir.orNull)
    }
  }

  /** PageRank in EXACT integer micro-units — the link-graph quality
    * signal of web-scale curation (harmonic/PageRank centrality ranks
    * crawl URLs before content filters ever run). Fixed `iters` power
    * iterations of `pr'(v) = (1−d)/N + d·Σ_{u→v} pr(u)/out(u)` with
    * d = 0.85, every term in micro-units under floor division:
    * base = `150000 div N`, each edge contribution
    * `(85·pr_micro(u)) div (100·out(u))` — deterministic in any
    * aggregation order and bit-identical cross-engine (the bigram-LM
    * numeric discipline; floors lose mass monotonically and
    * identically in both engines, which is why the oracle can unroll
    * the same recurrence). `unit` is the integer scale: the default
    * 1e6 (micro) underflows the base term past N ≈ 1e5 nodes — larger
    * graphs pass 1e9 (nano) or beyond; the constants scale with it
    * and the algorithm is unchanged (the soak runs nano at 10⁶
    * nodes).
    *
    * Scale shape: one iteration = one join of edges onto the current
    * ranks (both shuffling on the source id) + one partial-combinable
    * sum onto the destination + a left join back to the node universe
    * for sink nodes — identical to the [[connectedComponents]] round
    * shape; lineage grows linearly in `iters` (fixed and small), so no
    * checkpointing is needed.
    *
    * `edges` must be pre-deduplicated (u, v) pairs without self-loops;
    * nodes with no out-links contribute nothing (their mass leaks, the
    * standard simplification); nodes with no in-links hold the base.
    *
    * Returns (idCol, pr_micro, pr).
    */
  def pageRankMicro(nodes: DataFrame, edges: DataFrame, idCol: String,
                    srcCol: String, dstCol: String, nNodes: Long,
                    iters: Int = 10,
                    unit: Long = 1000000L): DataFrame = {
    require(iters > 0 && nNodes > 0 && unit > 0,
      s"bad iters/nNodes/unit: $iters/$nNodes/$unit")
    // Guard the ACTUAL smallest term, the teleport base (15%·unit)/n —
    // it floors to 0 well before unit/n does (any n in (0.15·unit,
    // unit]), which would silently degrade to base-0 PageRank.
    require((15L * unit / 100L) / nNodes > 0,
      s"unit $unit underflows at $nNodes nodes (teleport base " +
        "(15%*unit)/n = 0) — raise the scale (nano = 1e9, or beyond)")
    val outd = edges.groupBy(col(srcCol))
      .agg(count(lit(1)).as("__outd"))
    val base = (15L * unit / 100L) / nNodes
    var pr = nodes.select(col(idCol),
      lit(unit / nNodes).as("pr_micro"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(pr.select(col(idCol).as(srcCol), col("pr_micro")), Seq(srcCol))
        .join(outd, Seq(srcCol))
        .select(col(dstCol).as(idCol),
          expr("(85 * pr_micro) div (100 * __outd)").as("__c"))
        .groupBy(col(idCol))
        .agg(sum(col("__c")).as("__in"))
      pr = nodes.select(col(idCol))
        .join(contribs, Seq(idCol), "left")
        .select(col(idCol),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("pr_micro"))
    }
    pr.withColumn("pr", col("pr_micro") / unit.toDouble)
  }

  /** Persist a trained [[pageRankMicro]] authority table — the
    * train-once/serve-many split every other model family already has
    * (`Retrieval.writeBm25Index`, `Ivf.writeIndex`): a crawl scheduler
    * probes host authority on every budget decision, and retraining
    * the full power iteration inside each scheduling query is the
    * 100×-scale killer (the probe is O(hosts), the retrain is
    * O(edges · iters)).
    *
    * `<table>` holds `(idCol, pr_micro, pr)` bucketed by id — the
    * scheduler's join key — and `<table>_meta` pins the training
    * provenance (iters, n_nodes, unit, the id column's NAME) plus the
    * trained mass `sum_pr_micro`, the audit's conservation invariant:
    * PageRank mass is fixed at training time (Σ = n·base + propagated
    * mass, < unit under the documented sink-leak simplification), so
    * a stored table whose Σ drifts from the recorded one was
    * tampered with or half-written.
    */
  def writePageRank(pr: DataFrame, idCol: String, table: String,
                    iters: Int, nNodes: Long, unit: Long = 1000000L,
                    nBuckets: Int = 32): Unit = {
    Warehouse.resetTable(pr.sparkSession, table)
    Warehouse.resetTable(pr.sparkSession, s"${table}_meta")
    pr.select(col(idCol), col("pr_micro"), col("pr"))
      .write.format("parquet")
      .bucketBy(nBuckets, idCol).sortBy(idCol)
      .mode("overwrite").saveAsTable(table)
    val spark = pr.sparkSession
    val sum = spark.table(table)
      .agg(coalesce(org.apache.spark.sql.functions.sum(col("pr_micro")),
        lit(0L))).head.getLong(0)
    import spark.implicits._
    Seq((iters, nNodes, unit, idCol, sum))
      .toDF("iters", "n_nodes", "unit", "id_col", "sum_pr_micro")
      .coalesce(1)
      .write.format("parquet").mode("overwrite")
      .saveAsTable(s"${table}_meta")
  }

  /** Persist a trained connected-components labeling — the
    * [[writePageRank]] discipline applied to the mirror/identity
    * component family: at deployment scale components are MAINTAINED
    * state a scheduler probes (an O(nodes) bucketed join), never a
    * per-scheduling-query retrain (O(edges · rounds) of propagation
    * jobs). `<table>` holds `(idCol, component)` bucketed by id;
    * `<table>_meta` pins `(n_nodes, n_components, id_col)` — the
    * audit's invariants: the stored row count must equal the trained
    * node universe, every label must be ≤ its id (min-label
    * propagation never raises a label), and every label must itself
    * be a stored node whose OWN label is itself (labels resolve to
    * roots; a dangling or non-root label means a half-written or
    * hand-edited table). */
  def writeComponents(comp: DataFrame, idCol: String, table: String,
                      nBuckets: Int = 32): Unit = {
    Warehouse.resetTable(comp.sparkSession, table)
    Warehouse.resetTable(comp.sparkSession, s"${table}_meta")
    comp.select(col(idCol), col("component"))
      .write.format("parquet")
      .bucketBy(nBuckets, idCol).sortBy(idCol)
      .mode("overwrite").saveAsTable(table)
    val spark = comp.sparkSession
    val stats = spark.table(table)
      .agg(count(lit(1)), countDistinct(col("component"))).head
    import spark.implicits._
    Seq((stats.getLong(0), stats.getLong(1), idCol))
      .toDF("n_nodes", "n_components", "id_col")
      .coalesce(1)
      .write.format("parquet").mode("overwrite")
      .saveAsTable(s"${table}_meta")
  }

  /** The stored component labeling, `(id_col, component)` — the
    * scheduler's serve-side read. */
  def loadComponents(spark: org.apache.spark.sql.SparkSession,
                     table: String): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.table(table)
  }

  /** Retrain a persisted components artifact from the CURRENT edge
    * universe into the SAME layout — the one-call drift remedy every
    * other persisted model family already pairs with its drift check
    * ([[graft.ext.Ivf.rebuildIndex]] for `driftIvf`, PageRank's
    * retrain-and-rewrite for `driftPageRank`): when
    * [[graft.ext.IndexAudit.driftComponents]] trips — a crawl cycle
    * discovered mirror members the stored labeling has never seen —
    * the scheduler retrains [[connectedComponents]] over the full
    * current universe and rewrites through [[writeComponents]],
    * preserving the recorded id column name and the table's own bucket
    * count (a maintenance rewrite must never silently re-layout the
    * table out from under its Exchange-free probes — the
    * [[graft.streaming.RevisitStream.compactLog]] discipline). Probes
    * against the rebuilt table then see the new members' labels; until
    * the rebuild runs, probing them reads "not mirrored" — exactly the
    * stale answer the drift check exists to surface.
    *
    * `nodes`/`edges` are the current universe (nodes may be just the
    * edge endpoints — [[connectedComponents]] unions endpoints in
    * regardless); labeling is min-label, so the rebuild is
    * deterministic for any input order. */
  def rebuildComponents(spark: org.apache.spark.sql.SparkSession,
                        table: String, nodes: DataFrame, nodeCol: String,
                        edges: DataFrame, srcCol: String, dstCol: String,
                        maxIter: Int = 50,
                        checkpointDir: Option[String] = None): Unit = {
    val meta = spark.table(s"${table}_meta").head
    val idCol = meta.getString(meta.fieldIndex("id_col"))
    val nBuckets = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(32)
    val comp = connectedComponents(
      nodes.select(col(nodeCol).as(idCol)), idCol,
      edges, srcCol, dstCol, maxIter, checkpointDir)
    writeComponents(comp.select(col("id").as(idCol), col("component")),
      idCol, table, nBuckets)
    spark.catalog.refreshTable(table)
  }

  /** The stored authority table, `(id_col, pr_micro, pr)` — the
    * scheduler's serve-side read. */
  def loadPageRank(spark: org.apache.spark.sql.SparkSession,
                   table: String): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.table(table)
  }

  /** Retrain a persisted authority artifact from the CURRENT link
    * universe into the SAME layout — [[rebuildComponents]]'s one-call
    * drift remedy for the PageRank family: when
    * [[graft.ext.IndexAudit.driftPageRank]] trips — a crawl cycle
    * discovered hosts the stored node universe has never seen — the
    * scheduler retrains [[pageRankMicro]] over the full current
    * universe under the TRAINED hyper-parameters (`iters` and `unit`
    * read back from `<table>_meta`; a maintenance retrain must not
    * silently change the model family) and rewrites through
    * [[writePageRank]], preserving the recorded id column name and the
    * table's own bucket count (the probes' Exchange-free layout).
    * Until the rebuild runs, the scheduler's left join reads the new
    * hosts as authority 0 and schedules the hottest new hub dead
    * last — exactly the stale answer the drift check surfaces.
    *
    * `nodes` is the current universe (sinks and sources included —
    * [[pageRankMicro]] does NOT union edge endpoints in); `edges`
    * must be the pre-deduplicated current pair set. */
  def rebuildPageRank(spark: org.apache.spark.sql.SparkSession,
                      table: String, nodes: DataFrame, nodeCol: String,
                      edges: DataFrame, srcCol: String, dstCol: String)
      : Unit = {
    val meta = spark.table(s"${table}_meta").head
    val idCol = meta.getString(meta.fieldIndex("id_col"))
    val iters = meta.getInt(meta.fieldIndex("iters"))
    val unit = meta.getLong(meta.fieldIndex("unit"))
    val nBuckets = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(32)
    val universe = nodes.select(col(nodeCol).as(idCol)).distinct()
      .localCheckpoint() // consumed 3×: count, train base, sink join
    val n = universe.count()
    val pr = pageRankMicro(universe, edges, idCol, srcCol, dstCol,
      nNodes = n, iters = iters, unit = unit)
    writePageRank(pr, idCol, table, iters, n, unit, nBuckets)
    spark.catalog.refreshTable(table)
  }

  /** The stored model's id column name, from `<table>_meta`. */
  def pageRankIdCol(spark: org.apache.spark.sql.SparkSession,
                    table: String): String =
    spark.table(s"${table}_meta")
      .select(col("id_col")).head.getString(0)

  /** Persist the host-LINK edge relation — the incremental-discovery
    * half of the authority family ([[graft.ext.Dedup
    * .writeMirrorHashes]]' pattern applied to the link graph): at
    * deployment scale the expensive per-cycle leg is EXTRACTING
    * OUTLINKS FROM FETCHED BYTES, not the rank retrain (the power
    * iteration runs over a thin host×host relation), so the distinct
    * `(src, dst)` relation becomes maintained state a crawl cycle
    * APPENDS its newly discovered links into, and
    * [[rebuildPageRank]] retrains from the stored relation without
    * ever re-reading page bytes. Bucketed by `src` — the append's
    * semi-prune and each power iteration's contribution join both
    * key on it. */
  def writeHostLinks(edges: DataFrame, srcCol: String, dstCol: String,
                     table: String, nBuckets: Int = 32): Unit = {
    Warehouse.resetTable(edges.sparkSession, table)
    edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .write.format("parquet")
      .bucketBy(nBuckets, "src").sortBy("src", "dst")
      .mode("overwrite").saveAsTable(table)
  }

  /** Append one batch of discovered links to a [[writeHostLinks]]
    * relation: only `(src, dst)` pairs NEW to the store land, so the
    * stored relation stays exactly the union's distinct — a
    * re-crawled page re-emitting known links adds nothing, and a
    * retrain from the store stays bit-identical to training over the
    * unioned link universe (spec-pinned). Scale shape: the batch's
    * distinct source hosts broadcast to SEMI-PRUNE the bucketed store
    * scan (only buckets holding those sources are read), then the
    * anti-join of the batch against that out-degree-bounded slice
    * decides what is new; nothing corpus-sized shuffles per cycle. */
  def appendHostLinks(batch: DataFrame, srcCol: String, dstCol: String,
                      table: String): Unit = {
    val spark = batch.sparkSession
    spark.catalog.refreshTable(table)
    val fresh = batch.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val slice = spark.table(table).join(
      broadcast(fresh.select(col("src")).distinct()),
      Seq("src"), "left_semi")
    fresh.join(slice, Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst")) // insertInto is positional
      .write.mode("append").insertInto(table)
    spark.catalog.refreshTable(table)
  }

  /** The stored link universe, `(src, dst)` — [[rebuildPageRank]]'s
    * and the drift check's edge input. */
  def loadHostLinks(spark: org.apache.spark.sql.SparkSession,
                    table: String): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.table(table)
  }
}
