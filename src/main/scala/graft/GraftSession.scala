package graft

import org.apache.spark.sql.SparkSession

/** Library front door: one call builds a session with every graft
  * extension wired (as-of join strategy, CollapseRedundantRound optimizer
  * rule, `cosine_sim` SQL function — see plans.GraftExtensions) and, via
  * [[registerTables]], the test-data tables exposed as temp views so the
  * whole SURVEY §2 surface is reachable from plain `spark.sql`.
  *
  * A reference user's migration is: build the session here, point
  * registerTables at their parquet directory, and run their queries
  * through `SparkEntry.queries` or SQL.
  */
object GraftSession {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings")

  def builder(master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    Tuning.tuned(SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC"))
      .withExtensions(new plans.GraftExtensions)

  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession =
    builder(master, shufflePartitions).getOrCreate()

  /** Expose every sfDir table (including the ns-timestamp-safe events
    * reader) as a temp view for SQL use. */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    tableNames.foreach(n => Tables.t(spark, sfDir, n).createOrReplaceTempView(n))
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }
}
