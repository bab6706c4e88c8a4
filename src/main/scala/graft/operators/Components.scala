package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic HashMin connected-components fixpoint, shared by the two
  * near-dup clustering operators (`dedup_cluster` over the Jaccard pair
  * graph, `dedup_semantic_cluster` over the LSH-cosine embedding graph).
  * Component id = min node id reachable. Iterations bounded by component
  * diameter; each is one bounded shuffle (the Pregel/GraphX shape). Fails
  * loudly rather than returning partially-propagated labels.
  *
  * Conf scope: the whole fixpoint runs on a CLONED session (shared
  * context, isolated SQLConf) with shuffle.partitions=1 and AQE off. The
  * iterated frames are bounded by the caller's probe window: one native
  * shuffle partition replaces a per-frame coalesce(1) workaround, and
  * disabling AQE matters because `df.rdd` on an adaptive plan EXECUTES its
  * shuffle stages eagerly — every pin would pay a per-round
  * stage-materialization + re-planning tax. The caller's session conf is
  * never touched. On an unbounded graph the same loop runs
  * hash-partitioned with AQE on — drop the narrow conf and the broadcast
  * hints and it is the standard cluster-scale shape.
  *
  * Lineage discipline: every iterated frame is pinned — cached at the RDD
  * layer and re-wrapped as a fresh LogicalRDD-rooted DataFrame, which BOTH
  * avoids recomputation AND truncates the logical plan. cache() alone
  * truncates nothing logically: each round's plan would embed the previous
  * round's (twice, via the jump self-join), so Catalyst analysis cost
  * grows ~4× per iteration and dominates within a handful of rounds. (The
  * direct localCheckpoint API trips an attribute-rewrite bug on this plan
  * shape in Spark 4.1, so the truncation is spelled out as the rdd
  * round-trip.) Superseded RDDs are reclaimed by the ContextCleaner once
  * the loop drops them.
  */
private[operators] object Components {

  /** `pairs`: columns `d1`,`d2` — one row per UNDIRECTED edge
    * (symmetrized internally). `nodes` (one column `id`), when given,
    * fixes the label domain — pass it to include singletons in the
    * output; when None the domain is the edge-touched endpoint set,
    * derived from the ALREADY-PINNED pair frame so the (possibly
    * expensive) pair subtree is evaluated exactly once. Inputs may be
    * built on the caller's session at full shuffle parallelism — RDDs are
    * context-level, so they pin into the narrow loop session unchanged.
    * Returns the DISTRIBUTED labels frame (`doc_id`, `comp`), re-rooted on
    * the caller's session: the label set of a near-dup graph at corpus
    * scale is not driver-sized, so nothing on the query path collects —
    * downstream joins/windows consume it like any other frame.
    */
  def hashMinLabels(outer: SparkSession, pairs: DataFrame,
                    nodes: Option[DataFrame] = None): DataFrame = {
    val s = org.apache.spark.sql.graftbridge.Bridge.cloneSession(outer)
    s.conf.set("spark.sql.shuffle.partitions", "1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    def pin(df: DataFrame): DataFrame =
      s.createDataFrame(df.rdd.cache(), df.schema)
    val p = pin(pairs.select(col("d1"), col("d2")))
    val edges = pin(p.union(p.select(col("d2").as("d1"), col("d1").as("d2"))))
    val nodeIds = nodes.getOrElse(
      p.select(col("d1").as("id")).union(p.select(col("d2").as("id"))).distinct())
    var labels = pin(nodeIds.select(col("id").as("doc_id"))
      .withColumn("comp", col("doc_id")))
    // HashMin labels only ever DECREASE, so sum(comp) is strictly
    // decreasing until the fixpoint — an equal sum IS convergence. That
    // makes the check one cheap agg on the already-cached frame instead of
    // a compare-join + second action per iteration. Seeded with an
    // impossible sum (comps are non-negative ids) so no separate
    // initializing action is needed.
    var sumPrev = -1L
    val maxIter = 40 // pointer jumping ⇒ O(log diameter); generous slack
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // FUSED HashMin step + pointer jump, one aggregation per round:
      //   comp' := min(comp, min over neighbors' comp, comp[comp])
      // The jump reads the PREVIOUS round's labels (not this round's
      // half-stepped frame), so the whole round is a single union+min —
      // one pinned frame, one planning pass, one broadcast pair per round.
      // Jumping through the older frame still (at least) halves the
      // remaining pointer depth per round, so rounds stay O(log diameter);
      // every round contains the plain HashMin contribution, so the
      // fixpoint (min reachable id) is unchanged — and oracle-checked.
      val viaEdges = labels.join(broadcast(edges), labels("doc_id") === edges("d1"))
        .select(col("d2").as("doc_id"), col("comp"))
      val viaJump = labels.as("x")
        .join(broadcast(labels.select(col("doc_id").as("p"), col("comp").as("pc")).as("y")),
          col("x.comp") === col("y.p"), "left")
        .select(col("x.doc_id").as("doc_id"),
          coalesce(col("pc"), col("x.comp")).as("comp"))
      val next = pin(labels.select(col("doc_id"), col("comp"))
        .union(viaEdges).union(viaJump)
        .groupBy("doc_id").agg(min(col("comp")).as("comp")))
      // empty node set sums to NULL → 0: converges on the second round
      val sumNow = Option(next.agg(sum(col("comp"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      converged = sumNow == sumPrev
      sumPrev = sumNow
      labels = next
      iter += 1
    }
    require(converged, s"component labeling did not converge in $maxIter iterations")
    // re-root the final (already RDD-cached) label frame on the CALLER's
    // session, so downstream operators plan under the caller's conf — the
    // loop-local 1-partition/AQE-off conf never leaks, and no collect()
    // ever materializes the labels on the driver.
    outer.createDataFrame(labels.rdd, labels.schema)
  }
}
