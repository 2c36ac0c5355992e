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

  /** Connected components by iterative minimum-label propagation: every
    * node starts labeled with its own id; each round, every node lowers
    * its label to the minimum among itself and its neighbors; at
    * fixpoint, each component is labeled with its smallest member id.
    *
    * Scale shape: one round = one equi-join (messages along edges) + one
    * partial-combinable `min` aggregation — both shuffle on the node id,
    * both AQE-skew-safe. `localCheckpoint` after every round cuts the
    * lineage (an iterative plan otherwise grows by one join per round
    * until the optimizer dominates wall-clock). Rounds needed = component
    * diameter, which for near-dup clusters is tiny (dup clusters are
    * dense); for long-chain graphs the classic fix is large-star/
    * small-star (Kiveris et al., "Connected Components in MapReduce"),
    * which this module would adopt if diameters grew — the per-round
    * primitives are identical. The per-round `isEmpty` convergence probe
    * is a driver ACTION on a 1-row-bounded plan — the standard iterative
    * pattern (GraphX Pregel does the same), not a collect of data.
    *
    * Returns one row per node: (id, component) with
    * `component = min(node id in component)`.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint(true) // edges re-scan every round: pay the scan once
    val given = nodes.select(col(idCol).as("id"))
    // propagate over nodes ∪ edge endpoints: an endpoint missing from
    // `nodes` must still RELAY labels (and be visible to the convergence
    // probe — a label parked on an unknown id would otherwise look
    // converged one round early, silently splitting its component)
    val universe = given.union(sym.select(col("src").as("id"))).distinct()
    var labels = universe.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), labels("component"))
      val next = labels.union(msgs)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      // labels only ever decrease, so "any label still above the previous
      // round's value is impossible; any BELOW means not yet converged"
      converged = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") < col("o.component"))
        .isEmpty
      labels = next
      round += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds " +
        "(component diameter exceeds maxIter — raise it, or switch this " +
        "graph to the large-star/small-star variant)")
    // the contract is one row per INPUT node; relay-only endpoints drop
    labels.join(given, "id")
  }
}
