package graft

import org.apache.spark.sql.SparkSession

/** Central registry of SCALE PARAMETERS — every compiled constant that
  * must grow (or shrink) with data volume, each overridable at runtime
  * via `spark.graft.*` conf so a 100× deployment tunes it without
  * recompiling (VERDICT r13 item 3). SURVEY.md §6.7 carries the table;
  * KnobsSpec asserts every entry here resolves its conf override.
  *
  * Two knob classes, with different override semantics:
  *
  *  - '''capacity knobs''' (broadcast gates, bucket counts, LSH target
  *    occupancy): change WHERE work happens (broadcast vs shuffle,
  *    bucket fan-out), never what is computed. Safe to tune freely.
  *  - '''semantic round bounds''' (peel/BFS/Lloyd rounds): the operator
  *    is DEFINED as "N bounded rounds" and the DuckDB oracles unroll
  *    exactly the compiled default — overriding one changes the
  *    published result by design (more Lloyd rounds = a different
  *    clustering). Tune in deployments; leave at default under the
  *    correctness harness, which replays defaults.
  *
  * Accessors read the session conf on EVERY call, so a long-lived
  * driver can retune between corpora without rebuilding sessions.
  */
object Knobs {

  private def long(s: SparkSession, key: String, dflt: Long): Long =
    s.conf.getOption(key).map(_.toLong).getOrElse(dflt)
  private def int(s: SparkSession, key: String, dflt: Int): Int =
    s.conf.getOption(key).map(_.toInt).getOrElse(dflt)

  // ---- capacity knobs -----------------------------------------------

  /** Target mean vectors-per-bucket for the shared random-hyperplane LSH
    * (knn graph, range pairs, lsh_ann): plane count p is the smallest in
    * [8, 30] with occupancy·2^p ≥ |corpus|, so bucket fan-out grows with
    * data and the within-bucket candidate join stays ~linear (VERDICT
    * r13: fixed 8 planes → 256 buckets was quadratic at 10×). Default 8
    * reproduces the historical buckets at the oracle scales (≤2k
    * vectors → 8 planes) and SURVEY §6.5b's prescribed 12 planes at
    * sf~1's 20k. The DuckDB oracles recompute the same rule from
    * count(*), so the override is mirrored there ONLY at the default —
    * see class doc. */
  val LshTargetOccupancyKey = "spark.graft.lsh.targetOccupancy"
  val LshTargetOccupancyDefault = 8L
  def lshTargetOccupancy(s: SparkSession): Long =
    long(s, LshTargetOccupancyKey, LshTargetOccupancyDefault)

  /** Hash-partition count of the streaming upsert sink's keyed target
    * layout (`_pk = pmod(event_id, n)`). Per-batch merge cost is
    * O(touched buckets · bucket size); at 100 TB raise it so a bucket
    * stays executor-memory-sized. MUST be fixed for the life of one
    * target directory — changing it mid-stream re-keys the layout. */
  val UpsertPkBucketsKey = "spark.graft.upsert.pkBuckets"
  val UpsertPkBucketsDefault = 16
  def upsertPkBuckets(s: SparkSession): Int =
    int(s, UpsertPkBucketsKey, UpsertPkBucketsDefault)

  /** Edge-count gate under which HashMin component propagation
    * broadcasts the edge frame instead of shuffling per round. */
  val ComponentsBroadcastMaxEdgesKey = "spark.graft.components.broadcastMaxEdges"
  val ComponentsBroadcastMaxEdgesDefault = 2L << 20
  def componentsBroadcastMaxEdges(s: SparkSession): Long =
    long(s, ComponentsBroadcastMaxEdgesKey, ComponentsBroadcastMaxEdgesDefault)

  /** Node-count gate under which iterative graph queries (pagerank, LPA,
    * BFS frontiers, k-core keep-sets, truss neighbor sets) broadcast the
    * per-round node frame instead of shuffling it. */
  val GraphBroadcastMaxNodesKey = "spark.graft.graph.broadcastMaxNodes"
  val GraphBroadcastMaxNodesDefault = 4L << 20
  def graphBroadcastMaxNodes(s: SparkSession): Long =
    long(s, GraphBroadcastMaxNodesKey, GraphBroadcastMaxNodesDefault)

  // ---- semantic round bounds (oracles unroll the defaults) ----------

  /** Lloyd iterations for vec_kmeans / vec_spherical_kmeans. */
  val KmeansRoundsKey = "spark.graft.kmeans.rounds"
  val KmeansRoundsDefault = 3
  def kmeansRounds(s: SparkSession): Int =
    int(s, KmeansRoundsKey, KmeansRoundsDefault)

  /** Degree-peel rounds for graph_kcore. */
  val KcorePeelRoundsKey = "spark.graft.graph.kcorePeelRounds"
  val KcorePeelRoundsDefault = 6
  def kcorePeelRounds(s: SparkSession): Int =
    int(s, KcorePeelRoundsKey, KcorePeelRoundsDefault)

  /** Support-peel rounds for graph_ktruss. */
  val TrussRoundsKey = "spark.graft.graph.trussRounds"
  val TrussRoundsDefault = 6
  def trussRounds(s: SparkSession): Int =
    int(s, TrussRoundsKey, TrussRoundsDefault)

  /** Synchronous label-propagation rounds for graph_label_prop. */
  val LabelPropRoundsKey = "spark.graft.graph.labelPropRounds"
  val LabelPropRoundsDefault = 4
  def labelPropRounds(s: SparkSession): Int =
    int(s, LabelPropRoundsKey, LabelPropRoundsDefault)

  /** Frontier-expansion hops for graph_bfs_depth / graph_closeness. */
  val BfsRoundsKey = "spark.graft.graph.bfsRounds"
  val BfsRoundsDefault = 4
  def bfsRounds(s: SparkSession): Int =
    int(s, BfsRoundsKey, BfsRoundsDefault)

  /** Every knob: (conf key, compiled default, capacity|rounds) — the
    * machine-readable form of SURVEY §6.7, asserted by KnobsSpec. */
  val all: Seq[(String, String, String)] = Seq(
    (LshTargetOccupancyKey, LshTargetOccupancyDefault.toString, "capacity"),
    (UpsertPkBucketsKey, UpsertPkBucketsDefault.toString, "capacity"),
    (ComponentsBroadcastMaxEdgesKey, ComponentsBroadcastMaxEdgesDefault.toString, "capacity"),
    (GraphBroadcastMaxNodesKey, GraphBroadcastMaxNodesDefault.toString, "capacity"),
    (KmeansRoundsKey, KmeansRoundsDefault.toString, "rounds"),
    (KcorePeelRoundsKey, KcorePeelRoundsDefault.toString, "rounds"),
    (TrussRoundsKey, TrussRoundsDefault.toString, "rounds"),
    (LabelPropRoundsKey, LabelPropRoundsDefault.toString, "rounds"),
    (BfsRoundsKey, BfsRoundsDefault.toString, "rounds"))
}
