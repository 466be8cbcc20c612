package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the near-dup
  * CONSOLIDATION step: pair-mining (shingle/MinHash/SimHash/embedding
  * paths) says which documents match; components turn matches into a
  * dedup decision (every document labeled with the min doc id of its
  * duplicate cluster; keep one representative per label).
  *
  * Algorithm: iterative min-label propagation. Each round every vertex
  * takes the minimum label among itself and its neighbors; fixpoint in
  * O(diameter) rounds (near-dup clusters are shallow — a handful of
  * rounds even at corpus scale; the alternating large/small-star
  * optimization would cut worst-case rounds to O(log n) if ever needed).
  *
  * Scale shape: each round is one equi-join on vertex id + one min
  * aggregation — no collect of vertices or edges; the driver sees only a
  * 1-row convergence probe per round. Labels are localCheckpoint'ed
  * every round: iterative DataFrame loops otherwise accumulate lineage
  * that re-executes from scratch each round and overflows the planner.
  * Deterministic output (min ids), independent of partitioning.
  */
object Components {

  /** (doc_id, component_id) for every vertex of `edges` (columns a, b).
    * component_id = min doc_id reachable, i.e. the cluster
    * representative.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = sym.select(col("a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint()
    var changed = true
    while (changed) {
      val prop = labels.as("l")
        .join(sym.as("e"), col("l.doc_id") === col("e.a"))
        .select(col("e.b").as("doc_id"), col("l.label"))
        .union(labels)
        .groupBy("doc_id").agg(min("label").as("label"))
        .localCheckpoint()
      // converged when no vertex's label decreased this round
      changed = prop.as("n").join(labels.as("o"), "doc_id")
        .where(col("n.label") < col("o.label"))
        .limit(1).count() > 0
      labels = prop
    }
    labels.select(col("doc_id"), col("label").as("component_id"))
  }
}
