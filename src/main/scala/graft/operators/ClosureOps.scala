package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General transitive-closure over a parent/edge table, for hierarchies
  * whose parent function is data (not arithmetic like [[StatusOps.orgClosure]]).
  *
  * Reference semantics: `aws/source_id_manager.py:fetch_org_rules` walks
  * `parent_organizations` chains until exhausted (with a visited set).
  * Set-at-a-time equivalent: the ancestor closure of the edge relation.
  *
  * Scale design: true path doubling. Iteration k holds every path of
  * length <= 2^k; one self-join per iteration doubles the reachable
  * depth, so a depth-d hierarchy needs ceil(log2 d) shuffles — not d.
  * Each iteration `localCheckpoint`s the accumulated frame: the join is
  * fed materialized partitions instead of a lineage that re-executes all
  * previous iterations (the classic iterative-Spark blowup), and the
  * fixpoint test is a cheap count on the checkpointed data.
  */
object ClosureOps {

  /** All (node, ancestor, depth) pairs reachable by following `parentCol`
    * edges. `edges` must have one row per child→parent link; cycles are
    * tolerated (a cycle's paths stop growing once every pair is seen,
    * because `maxDepth` bounds path length).
    *
    * @param maxDepth  safety bound on path length (default 2^20); the loop
    *                  exits as soon as an iteration adds no new paths.
    */
  def ancestorClosure(edges: DataFrame, nodeCol: String = "node",
      parentCol: String = "parent", maxDepth: Long = 1L << 20): DataFrame = {
    var paths = edges
      .select(col(nodeCol).as("node"), col(parentCol).as("ancestor"),
        lit(1).as("depth"))
      .localCheckpoint()
    var reach = 1L
    var prevCount = -1L
    var count = paths.count()
    while (count != prevCount && reach < maxDepth) {
      val doubled = paths.as("a")
        .join(paths.as("b"), col("a.ancestor") === col("b.node"))
        .select(col("a.node").as("node"), col("b.ancestor").as("ancestor"),
          (col("a.depth") + col("b.depth")).as("depth"))
        .filter(col("depth") <= maxDepth)
      paths = paths.unionByName(doubled).distinct().localCheckpoint()
      prevCount = count
      count = paths.count()
      reach *= 2
    }
    paths
  }
}
