package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 contributes one entry to `queries`
  * (run on `$sfDir/<table>.parquet`) and, when DuckDB can express the same
  * semantics, a matching oracle SQL string in `oracleSql`. Modules own
  * their slices; this object is just the union.
  */
object SparkEntry {

  /** Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Aggregates.queries ++
      operators.Relational.queries ++
      operators.SetOps.queries ++
      operators.Windows.queries ++
      functions.ScalarBank.queries ++
      operators.TextOps.queries ++
      operators.VectorOps.queries ++
      operators.EtlOps.queries ++
      operators.TypedOps.queries ++
      operators.ScaleOps.queries ++
      operators.ShapeOps.queries ++
      operators.AnalyticsOps.queries ++
      operators.LmOps.queries ++
      operators.MinHashDedup.queries ++
      operators.Multimodal.queries ++
      operators.MultimodalFrames.queries ++
      sources.RestQueries.queries ++
      streaming.Streams.queries ++
      streaming.StreamDedup.queries

  def oracleSql: Map[String, String] =
    operators.Aggregates.oracles ++
      operators.Relational.oracles ++
      operators.SetOps.oracles ++
      operators.Windows.oracles ++
      functions.ScalarBank.oracles ++
      operators.TextOps.oracles ++
      operators.VectorOps.oracles ++
      operators.EtlOps.oracles ++
      operators.TypedOps.oracles ++
      operators.ScaleOps.oracles ++
      operators.ShapeOps.oracles ++
      operators.AnalyticsOps.oracles ++
      operators.LmOps.oracles ++
      operators.MinHashDedup.oracles ++
      operators.Multimodal.oracles ++
      operators.MultimodalFrames.oracles ++
      sources.RestQueries.oracles ++
      streaming.Streams.oracles ++
      streaming.StreamDedup.oracles
}
